package graft.operators

import org.apache.spark.sql.types._

/** Typed bound-encoding of raw scan predicates into manifest CNF
  * constraints — the core the r14/r15 SQL-surface pruning built inside
  * the Engine, extracted (r16) so BOTH front ends share one encoder:
  *
  *   - the Engine's statement front end (ScanPrune conjunct extraction
  *     over the SQL token stream — Engine.manifestCandidates), and
  *   - the execution-time file-listing path (Catalyst `dataFilters`
  *     translated by graft.sources.CatalystPrune and routed through
  *     graft.sources.GraftFileIndex), which fires from ANY plan shape —
  *     joins, subqueries, CTEs — not just single-table statements.
  *
  * The contract is unchanged: a returned constraint can only SKIP a
  * file that provably holds no matching row (the query's own filters
  * still execute in full), so a predicate that fails to encode is
  * simply dropped — except inside a disjunction, where dropping one
  * branch would NARROW the OR (unsound), so a partial encode drops the
  * whole OR. Values travel through [[SnapshotOps.encodeBound]] — the
  * SAME order-preserving map the manifest bounds were recorded with.
  */
object ManifestPrune {
  import graft.dialect.ScanPrune

  type Alt = (Option[BigDecimal], Option[BigDecimal])

  /** 'yyyy-MM-dd[ HH:mm:ss[.f…]]' under `zone` → the instant; None on
    * any parse failure. The ONE normalization TIMESTAMP AS OF and
    * timestamp-bound pruning share — they must never drift apart. */
  def parseLocalInstant(s: String,
      zone: java.time.ZoneId): Option[java.time.Instant] = {
    val t = s.trim.replace(' ', 'T')
    val full = if (t.contains("T")) t else t + "T00:00:00"
    scala.util.Try(
      java.time.LocalDateTime.parse(full).atZone(zone).toInstant).toOption
  }

  private def parseTs(s: String,
      zone: java.time.ZoneId): Option[BigDecimal] =
    parseLocalInstant(s, zone).map(SnapshotOps.encodeBound)

  /** Raw predicates → CNF manifest constraints against `dir`@`version`:
    * per column a DISJUNCTION of encoded (lo, hi) interval
    * alternatives, keyed by PHYSICAL column names, plus derived `_p.`
    * hidden-partition constraints for every spec ever in force. Empty
    * when nothing translated. Feed the result to
    * [[SnapshotOps.predFilesCnf]]. */
  def cnfPreds(dir: String, version: Int, schema: StructType,
      raws: Seq[ScanPrune.RawPred],
      sessTz: java.time.ZoneId): Seq[(String, Seq[Alt])] = {

    // type a raw literal against the column's Spark type; None drops
    // the conjunct (a dropped conjunct never unsoundly prunes).
    // `bdir` is the bound's role: -1 = lower bound, +1 = upper bound,
    // 0 = equality probe. Float/double bounds are stored as shortest-
    // round-trip decimals of the BINARY value, and Spark casts the
    // literal to the column type before comparing — so the probe must
    // round through the column type too (0.30000000000000001 → 0.3d),
    // widened one ulp outward for inequalities to absorb the
    // round-to-nearest direction. Verbatim decimals would prune files
    // whose stored bound IS the value Spark actually compares.
    def fpProbe(d: Double, bdir: Int): Option[BigDecimal] = {
      if (d.isNaN || d.isInfinite) return None
      val p = if (bdir < 0) Math.nextDown(d)
        else if (bdir > 0) Math.nextUp(d) else d
      if (p.isInfinite) None else Some(BigDecimal(p.toString))
    }
    def fpProbeF(f: Float, bdir: Int): Option[BigDecimal] = {
      if (f.isNaN || f.isInfinite) return None
      val p = if (bdir < 0) Math.nextDown(f)
        else if (bdir > 0) Math.nextUp(f) else f
      if (p.isInfinite) None else Some(BigDecimal(p.toString))
    }
    def encode(dt: DataType, l: ScanPrune.Lit,
        bdir: Int = 0): Option[BigDecimal] =
      (dt, l) match {
        case (DoubleType, ScanPrune.NumLit(v)) => fpProbe(v.toDouble, bdir)
        case (FloatType, ScanPrune.NumLit(v)) => fpProbeF(v.toFloat, bdir)
        case (_: NumericType, ScanPrune.NumLit(v)) => Some(v)
        case (StringType, ScanPrune.StrLit(s)) =>
          Some(SnapshotOps.encodeBound(s))
        case (TimestampType, ScanPrune.StrLit(s)) => parseTs(s, sessTz)
        case (TimestampType, ScanPrune.TsLit(s)) => parseTs(s, sessTz)
        case (TimestampType, ScanPrune.DateLit(s)) =>
          scala.util.Try(java.time.LocalDate.parse(s.trim)
            .atStartOfDay(sessTz).toInstant).toOption
            .map(SnapshotOps.encodeBound)
        case (DateType, ScanPrune.DateLit(s)) =>
          scala.util.Try(BigDecimal(
            java.time.LocalDate.parse(s.trim).toEpochDay)).toOption
        case (DateType, ScanPrune.StrLit(s)) =>
          scala.util.Try(BigDecimal(
            java.time.LocalDate.parse(s.trim).toEpochDay)).toOption
        // already encoded by the typed front end — any column type
        case (_, ScanPrune.EncLit(v)) => Some(v)
        case _ => None
      }

    // raw predicates → per-column DISJUNCTIONS of encoded (lo, hi)
    // interval alternatives, intersected across conjuncts (each
    // alternative tightens independently). Plain conjuncts are the
    // one-alternative case; same-column ORs and IN lists contribute
    // several (r15).
    val merged = scala.collection.mutable.Map.empty[String, Seq[Alt]]
    def constrain(col: String, alts: Seq[Alt]): Unit = {
      val cur = merged.getOrElse(col,
        Seq((Option.empty[BigDecimal], Option.empty[BigDecimal])))
      merged(col) = cur.flatMap { case (l0, h0) =>
        alts.map { case (l1, h1) =>
          (Seq(l0, l1).flatten.reduceOption(_ max _),
            Seq(h0, h1).flatten.reduceOption(_ min _)) } }
    }
    def tighten(col: String, lo: Option[BigDecimal],
        hi: Option[BigDecimal]): Unit = constrain(col, Seq((lo, hi)))
    // one simple predicate → its interval; None when it doesn't
    // encode (the caller decides whether dropping is sound)
    def altOf(f: StructField, raw: ScanPrune.RawPred): Option[Alt] =
      raw match {
        case ScanPrune.Cmp(_, op, l) =>
          val bdir = op match {
            case ">" | ">=" => -1 case "<" | "<=" => 1 case _ => 0 }
          encode(f.dataType, l, bdir).flatMap { v =>
            op match {
              case "=" => Some((Some(v), Some(v)))
              case ">" | ">=" => Some((Some(v), None))
              case "<" | "<=" => Some((None, Some(v)))
              case _ => None
            }
          }
        case ScanPrune.Between(_, a, b) =>
          for {
            lo <- encode(f.dataType, a, -1)
            hi <- encode(f.dataType, b, 1)
          } yield (Some(lo), Some(hi))
        case ScanPrune.Prefix(_, p) if f.dataType == StringType =>
          Some((Some(SnapshotOps.encodeBound(p)),
            Some(SnapshotOps.prefixUpperBound(p))))
        case _ => None
      }
    // an IN list as EXACT point alternatives (capped: a huge list
    // falls back to its envelope to bound the alternative
    // cross-product)
    def inAlts(f: StructField,
        lits: Seq[ScanPrune.Lit]): Option[Seq[Alt]] = {
      val enc = lits.map(encode(f.dataType, _))
      if (!enc.forall(_.isDefined)) None
      else {
        val vs = enc.flatten
        if (vs.size <= 64) Some(vs.map(v => (Some(v), Some(v))))
        else Some(Seq((Some(vs.min), Some(vs.max))))
      }
    }
    raws.foreach { raw =>
      schema.fields.find(_.name.equalsIgnoreCase(raw.col)).foreach { f =>
        raw match {
          case ScanPrune.InList(_, lits) =>
            inAlts(f, lits).foreach(constrain(f.name, _))
          case ScanPrune.OrSame(_, branches) =>
            // EVERY branch must encode: dropping one branch would
            // NARROW a disjunction — unsound, unlike dropping a
            // conjunct — so a partial encode drops the whole OR
            val alts = branches.map {
              case ScanPrune.InList(_, lits) => inAlts(f, lits)
              case b => altOf(f, b).map(Seq(_))
            }
            if (alts.forall(_.isDefined))
              constrain(f.name, alts.flatten.flatten)
          case simple =>
            altOf(f, simple).foreach { case (lo, hi) =>
              tighten(f.name, lo, hi) }
        }
      }
    }
    // hidden-partition transforms (r15): a conjunct on a partitioned
    // column ALSO constrains the derived `_p.` bound key — days /
    // truncate are monotone (endpoint-mapped intervals), bucket
    // serves point probes through the probeHash-identical hash.
    // Derived keys are spec-level names, never column-mapped.
    val derivedMerged = scala.collection.mutable.Map.empty[String, Seq[Alt]]
    // the UNION of every spec ever in force: a transform dropped by
    // evolution still prunes the files written under it
    val spec = SnapshotOps.partitionSpecAll(dir, version)
    if (spec.nonEmpty) {
      def dConstrain(key: String, alts: Seq[Alt]): Unit = {
        val cur = derivedMerged.getOrElse(key,
          Seq((Option.empty[BigDecimal], Option.empty[BigDecimal])))
        derivedMerged(key) = cur.flatMap { case (l0, h0) =>
          alts.map { case (l1, h1) =>
            (Seq(l0, l1).flatten.reduceOption(_ max _),
              Seq(h0, h1).flatten.reduceOption(_ min _)) } }
      }
      // the raw predicate's plain alternatives, endpoint-mapped by a
      // monotone transform (OrSame skipped: partial derivation of a
      // disjunction would be unsound)
      def mono(f: StructField, raw: ScanPrune.RawPred,
          g: BigDecimal => BigDecimal): Option[Seq[Alt]] = {
        val alts = raw match {
          case ScanPrune.InList(_, lits) => inAlts(f, lits)
          case _: ScanPrune.OrSame => None
          case simple => altOf(f, simple).map(Seq(_))
        }
        alts.map(_.map { case (lo, hi) => (lo.map(g), hi.map(g)) })
      }
      def truncStr(w: Int, raw: ScanPrune.RawPred): Option[Seq[Alt]] = {
        def enc(s: String) = SnapshotOps.encodeBound(s.take(w))
        raw match {
          case ScanPrune.Cmp(_, op, ScanPrune.StrLit(s)) => op match {
            case "=" => Some(Seq((Some(enc(s)), Some(enc(s)))))
            case ">" | ">=" => Some(Seq((Some(enc(s)), None)))
            case "<" | "<=" => Some(Seq((None, Some(enc(s)))))
            case _ => None
          }
          case ScanPrune.Between(_, ScanPrune.StrLit(a),
              ScanPrune.StrLit(b)) =>
            Some(Seq((Some(enc(a)), Some(enc(b)))))
          case ScanPrune.Prefix(_, p) =>
            if (p.length >= w) Some(Seq((Some(enc(p)), Some(enc(p)))))
            else Some(Seq((Some(SnapshotOps.encodeBound(p)),
              Some(SnapshotOps.prefixUpperBound(p)))))
          case ScanPrune.InList(_, ls)
              if ls.forall(_.isInstanceOf[ScanPrune.StrLit]) =>
            Some(ls.map { case ScanPrune.StrLit(s) =>
              (Option(enc(s)), Option(enc(s))) })
          case _ => None
        }
      }
      def bucketAlts(pf: SnapshotOps.PartField, f: StructField,
          raw: ScanPrune.RawPred): Option[Seq[Alt]] = {
        def valOf(l: ScanPrune.Lit): Option[Any] = (f.dataType, l) match {
          case (IntegerType, ScanPrune.NumLit(v)) =>
            v.toBigIntExact.filter(_.isValidInt).map(_.toInt)
          case (LongType, ScanPrune.NumLit(v)) =>
            v.toBigIntExact.filter(_.isValidLong).map(_.toLong)
          case (StringType, ScanPrune.StrLit(s)) => Some(s)
          case _ => None
        }
        def pt(value: Any): Alt = {
          val b = BigDecimal(
            SnapshotOps.bucketOf(value, f.dataType, pf.arg))
          (Some(b), Some(b))
        }
        raw match {
          case ScanPrune.Cmp(_, "=", l) => valOf(l).map(v => Seq(pt(v)))
          case ScanPrune.InList(_, ls) =>
            val vs = ls.map(valOf)
            if (vs.forall(_.isDefined)) Some(vs.flatten.map(pt)) else None
          case _ => None
        }
      }
      raws.foreach { raw =>
        schema.fields.find(_.name.equalsIgnoreCase(raw.col)).foreach { f =>
          spec.filter(_.col.equalsIgnoreCase(raw.col)).foreach { pf =>
            val alts = pf.transform match {
              case "identity" => mono(f, raw, identity)
              case "days" => f.dataType match {
                case TimestampType => mono(f, raw, SnapshotOps.dayOfMicros)
                case DateType => mono(f, raw, identity)
                case _ => None
              }
              case "truncate" => f.dataType match {
                case dt if SnapshotOps.integral(dt) =>
                  mono(f, raw, SnapshotOps.truncateInt(_, pf.arg))
                case StringType => truncStr(pf.arg, raw)
                case _ => None
              }
              case "bucket" => bucketAlts(pf, f, raw)
              case _ => None
            }
            alts.foreach(dConstrain(pf.key, _))
          }
        }
      }
    }
    if (merged.isEmpty && derivedMerged.isEmpty) Seq.empty
    else merged.toSeq.map { case (c, alts) =>
      (SnapshotOps.physicalName(dir, version, c), alts) } ++
      derivedMerged.toSeq
  }
}
