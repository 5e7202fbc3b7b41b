package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dialect.DuckRewriter
import graft.functions.GraftFunctions

/** Shared plumbing for the SparkEntry query catalog. */
object Queries {
  type Fn = (SparkSession, String) => DataFrame

  /** One operator-inventory entry: a Spark implementation plus (when the
    * semantics are SQL-expressible) an equivalent DuckDB oracle query.
    * `headline = true` marks the queries Bench times at sf0.1. */
  final case class Spec(fn: Fn, oracle: Option[String],
      headline: Boolean = false)

  def prep(spark: SparkSession, sfDir: String): Unit = {
    Tables.registerAll(spark, sfDir)
    GraftFunctions.register(spark)
  }

  /** Spark SQL text + DuckDB oracle text (they differ only where the
    * dialects force it — function names, flags). */
  def sql(sparkSql: String, duckSql: String, headline: Boolean = false): Spec =
    Spec((spark, sfDir) => { prep(spark, sfDir); spark.sql(sparkSql) },
      Some(duckSql), headline)

  /** Identical text runs on both engines. */
  def same(q: String, headline: Boolean = false): Spec = sql(q, q, headline)

  /** DuckDB-dialect text: Spark runs it through the DuckRewriter front-end,
    * DuckDB gets the original verbatim — this puts the dialect layer itself
    * inside the correctness gate. */
  def duck(duckSql: String, headline: Boolean = false): Spec =
    Spec((spark, sfDir) => {
      prep(spark, sfDir)
      val schemaOf: String => Option[Seq[String]] = t =>
        scala.util.Try(spark.table(t).columns.toSeq).toOption
      spark.sql(DuckRewriter.rewrite(duckSql, schemaOf))
    }, Some(duckSql), headline)

  /** Not SQL-expressible on DuckDB (approximate / engine-specific) — the
    * driver records a rows-only check; ScalaTest covers semantics. */
  def noOracle(fn: Fn, headline: Boolean = false): Spec =
    Spec((spark, sfDir) => { prep(spark, sfDir); fn(spark, sfDir) },
      None, headline)

  /** DataFrame-API implementation with a handwritten DuckDB oracle. */
  def api(fn: Fn, duckSql: String, headline: Boolean = false): Spec =
    Spec((spark, sfDir) => { prep(spark, sfDir); fn(spark, sfDir) },
      Some(duckSql), headline)

  /** Footer-level size gate for FACT-SLICE broadcast hints (r16, the
    * r15 verdict's What's-wrong #1). A BROADCAST hint is honored
    * regardless of runtime size, so hinting an O(fact) slice — even a
    * well-filtered one — is a driver-OOM risk at 100×. This gate
    * bounds the slice by the table's ON-DISK bytes scaled by the
    * projected-column fraction (a filtered slice of a projection can
    * never exceed the projection itself) and emits the hint only
    * under a driver-safe cap; past the cap the un-hinted plan runs
    * and AQE's runtime size-based conversion still broadcasts when
    * the MEASURED slice is small, or keeps the shuffle join when it
    * isn't — degrading, never OOMing.
    * Why not always rely on AQE: measured at sf0.1 (quiet, min over 3
    * runs) the materialize-then-convert path costs q90 1.15 s vs
    * 0.74 s hinted and q106 0.88 s vs 0.70 s — AQE must shuffle-write
    * BOTH join inputs (the fact side included) before it can measure
    * the small side, so the "free" conversion pays a full fact
    * shuffle write. The gate keeps the direct-broadcast plan at every
    * scale where it is provably safe and hands off to AQE beyond. */
  def hintIfSliceSmall(spark: SparkSession, sfDir: String, table: String,
      keepCols: Int, hint: String, capBytes: Long = 128L << 20): String =
    if (sliceBytes(spark, sfDir, table, keepCols) <= capBytes) hint else ""

  /** On-disk bytes of a table pro-rated to the columns a query keeps —
    * the footer-level size estimate the join-hint gates compare
    * against their caps. */
  def sliceBytes(spark: SparkSession, sfDir: String, table: String,
      keepCols: Int): Long = {
    def bytes(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).getOrElse(Array.empty).map(bytes).sum
      else f.length
    val onDisk = bytes(new java.io.File(s"$sfDir/$table.parquet"))
    val total = math.max(spark.table(table).schema.size, keepCols)
    onDisk * keepCols / total
  }

  /** Cap for broadcasting a whole DIMENSION into a fact join (q08/
    * q09's customer). Much tighter than the 128 MB driver-safety cap:
    * the broadcast's cost here is the single-threaded BUILD of the
    * map, which loses to a shuffled-hash join long before the driver
    * is at risk. Measured (JoinAbProbe, min of 3, broadcast vs
    * SHUFFLE_HASH on the same shape): slice 1.9 MB (sf3sv, 450k
    * customers) broadcast wins 0.54 vs 0.82 s; slice 6.2 MB (sf10sv,
    * 1.5M) SHUFFLE_HASH wins 0.87 vs 1.63 s; slice 18 MB (sf30, 4.5M)
    * SHUFFLE_HASH wins 1.60 vs 3.61 s. 4 MB splits the measured
    * crossover. */
  val DimBuildCapBytes: Long = 4L << 20

  /** Cap for the fact-leg⋈fact-leg join in Q5 shapes (q91's l⋈o):
    * under it the un-hinted plan runs (Spark/AQE picks; the direct
    * measurement says broadcast-o regresses there — q91 plan note);
    * past it SHUFFLE_HASH on the narrower leg beats the default
    * sort-merge (no sort of either multi-M-row leg). Measured
    * (JoinAbProbe): o-slice 17.8 MB (sf3sv) wash (1.06 vs 1.06 s);
    * 59.5 MB (sf10sv) SHUFFLE_HASH wins 1.99 vs 2.43 s; 179 MB (sf30)
    * wins 4.66 vs 7.28 s. */
  val FactLegCapBytes: Long = 32L << 20

  /** The fact-slice JOIN hint with its past-the-cap fallback (r16):
    * under the footer cap the slice broadcasts (see
    * [[hintIfSliceSmall]]); past it the hint degrades to SHUFFLE_HASH
    * on the same side — each task builds a hash map of only its
    * PARTITION of the slice (memory-safe at any scale), and the fact
    * side streams through unsorted. Without this, Spark's default past
    * the broadcast threshold is a sort-merge join whose fact-side SORT
    * dominates (measured sf30, q90: SMJ 40.9 s vs SHUFFLE_HASH —
    * the sort of ~150M surviving lineitem rows, pure overhead for a
    * join that aggregates right after). */
  def factJoinHint(spark: SparkSession, sfDir: String, table: String,
      keepCols: Int, alias: String,
      capBytes: Long = 128L << 20): String =
    s"/*+ ${factJoinHintSpec(spark, sfDir, table, keepCols, alias, capBytes)} */ "

  /** [[factJoinHint]] without the comment wrapper, for composing with
    * other hints in one comment (Spark reads only the first hint
    * comment after SELECT). */
  def factJoinHintSpec(spark: SparkSession, sfDir: String, table: String,
      keepCols: Int, alias: String,
      capBytes: Long = 128L << 20): String =
    if (sliceBytes(spark, sfDir, table, keepCols) <= capBytes)
      s"BROADCAST($alias)"
    else s"SHUFFLE_HASH($alias)"
}

/** Relational core + dialect + function coverage (SURVEY.md §2.1–§2.8).
  * Design rules applied throughout:
  *   - dimension tables get explicit BROADCAST hints (they stay broadcastable
  *     at any sf — Tables.broadcastable);
  *   - every aggregate over doubles is rounded identically on both engines
  *     (sum order differs across engines/parallelism, so raw doubles can
  *     differ in the last ulp);
  *   - int-like derived columns are cast to BIGINT on both sides so schemas
  *     hash-match (DuckDB length()/position() return BIGINT, Spark INT);
  *   - every query carries a total ORDER BY so results are deterministic.
  */
object CoreQueries {
  import Queries._

  val all: Seq[(String, Spec)] = Seq(

    // S1/P2/P8 — base scan, comparison predicates; filter+projection push
    // down to the parquet scan (verified via explain in QueriesSpec).
    "q01_scan_filter" -> same(
      """SELECT p_partkey, p_name, p_brand, p_size FROM part
        |WHERE p_size >= 25 AND p_type = 'ECONOMY' ORDER BY p_partkey"""
        .stripMargin),

    // P1/P15/F20 — projection + arithmetic + alias
    "q02_proj_alias" -> same(
      """SELECT p_partkey, round(p_retailprice / 0.85, 2) AS price_usd
        |FROM part ORDER BY p_partkey""".stripMargin),

    // P9/P10 — LIKE, OR
    "q03_like_or" -> same(
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_name LIKE '%7%' OR c_mktsegment LIKE '%ILD%'
        |ORDER BY c_custkey""".stripMargin),

    // P11/A2 — IS NOT NULL + grouped count
    "q04_filter_group_count" -> same(
      """SELECT event_type, count(*) AS n FROM events
        |WHERE props IS NOT NULL AND value > 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // A1 — ungrouped aggregates
    "q05_agg_ungrouped" -> same(
      """SELECT count(*) AS cnt, round(avg(l_quantity), 4) AS avg_qty,
        |  round(max(l_extendedprice), 2) AS max_price,
        |  round(min(l_discount), 4) AS min_disc
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'""".stripMargin),

    // A4/A5/O1 — the TPC-H Q1 shape: partial aggregation (map-side combine)
    // before the single shuffle on the tiny (flag,status) key space.
    // Money sums go through DECIMAL so the result is independent of
    // partitioning/add order (double sums are not associative; at cluster
    // scale the add order is never deterministic).
    "q06_tpch_q1" -> same(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_base,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin, headline = true),

    // A3/A7 — HAVING over grouped aggregate
    "q07_group_having" -> same(
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) > 5 ORDER BY o_custkey""".stripMargin),

    // J1 — fact⋈dim, join strategy gated on the dimension's size
    // ([[Queries.DimBuildCapBytes]] — broadcast while the customer
    // slice is small, SHUFFLE_HASH once the single-threaded broadcast
    // BUILD dominates; the fact side never sorts on either path).
    // Floor notes (JoinAbProbe, min of 3): r15 sf3sv — pre-aggregating
    // orders by o_custkey before the customer join measured 0.87 s vs
    // 0.54 s for this shape (the per-custkey agg state costs more than
    // the probe it saves). r16 — broadcast vs SHUFFLE_HASH: sf3sv
    // 0.54/0.82, sf10sv 1.63/0.87, sf30 3.61/1.60 s; the gate flips
    // between them at the measured crossover. Pre-aggregating orders
    // by o_custkey BEFORE the shuffled-hash join also loses (r16b:
    // 0.96 vs 0.91 s sf10sv, 2.91 vs 2.27 s sf30) — the ~|customer|
    // agg state costs more than the narrower shuffle saves, the same
    // verdict as the r15 broadcast-path A/B. The residual vs DuckDB
    // is the probe constant on a dense-key hash relation, not a
    // shuffle; there is no plan below one pass over orders plus one
    // probe per row.
    // Irreducible-floor note (r16, sf30 — JoinFloorProbe +
    // tools/headtohead_sf30.json, DuckDB at 32 threads on the same
    // parquet): the bare orders 2-col scan-sum floor is 0.146 s vs
    // the full entry's 1.60-2.17 s and DuckDB's 0.78 s. Scan
    // throughput is at parity (q105 full: 0.63 graft vs 0.66 duck);
    // the 2.8x residual is the single-node join-machinery delta
    // (exchange + codegen'd build/probe vs DuckDB's in-memory
    // vectorized join) — the cost a multi-executor cluster
    // partitions away, and the component DuckDB cannot scale out.
    "q08_join_agg" -> api((spark, sfDir) => spark.sql {
      val h = factJoinHint(spark, sfDir, "customer", keepCols = 2,
        alias = "customer", capBytes = DimBuildCapBytes)
      s"""SELECT $h c_mktsegment,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    },
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      headline = true),

    // J2/J5 — 3-way chain join. nation (25 rows, scale-invariant)
    // always broadcasts; customer takes the same size-gated
    // broadcast-or-SHUFFLE_HASH as q08 (r16 A/B: 0.63/0.74 s sf3sv,
    // 1.56/0.99 sf10sv, 3.39/1.75 sf30). Floor note (r15 A/B, sf3sv —
    // JoinAbProbe): aggregating by c_nationkey below the nation join
    // measured a wash (0.655 vs 0.660 s) — Catalyst already pushes
    // the partial agg below the tiny-dim join, so the rewrite buys
    // nothing; shape kept canonical.
    // Irreducible-floor note (r16, sf30): orders 2-col floor 0.146 s;
    // full entry 1.75-2.10 s vs DuckDB 0.76 s (2.77x) — same
    // join-machinery residual as q08 (see its note); the extra nation
    // hop is a 25-row broadcast, free at every scale.
    "q09_join3_chain" -> api((spark, sfDir) => spark.sql {
      val ch = factJoinHintSpec(spark, sfDir, "customer", keepCols = 2,
        alias = "customer", capBytes = DimBuildCapBytes)
      s"""SELECT /*+ $ch, BROADCAST(nation) */ n_name,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin
    },
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
      headline = true),

    // J3 — join + DISTINCT
    "q10_join_distinct" -> sql(
      """SELECT /*+ BROADCAST(part) */ DISTINCT p_brand
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity >= 49 ORDER BY p_brand""".stripMargin,
      """SELECT DISTINCT p_brand
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity >= 49 ORDER BY p_brand""".stripMargin),

    // J4 — self-join via aliases
    "q11_self_join" -> same(
      """SELECT a.n_name AS n1, b.n_name AS n2
        |FROM nation a JOIN nation b
        |  ON a.n_regionkey = b.n_regionkey
        | AND a.n_nationkey < b.n_nationkey
        |ORDER BY n1, n2""".stripMargin),

    // P13/C4/J6 — IN subquery → left-semi join
    "q12_in_subquery" -> same(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin, headline = true),

    // P14/C3 — scalar subquery
    "q13_scalar_subquery" -> same(
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_retailprice = (SELECT max(p_retailprice) FROM part)
        |ORDER BY p_partkey""".stripMargin),

    // C1/A9 — CTE chain of aggregations (the dev.json:287 shape)
    "q14_cte_chain" -> same(
      """WITH per_nation AS (
        |  SELECT c_nationkey, avg(c_acctbal) AS avg_bal
        |  FROM customer GROUP BY c_nationkey
        |), mx AS (SELECT max(avg_bal) AS m FROM per_nation)
        |SELECT n_name, round(avg_bal, 2) AS avg_bal
        |FROM per_nation JOIN nation ON n_nationkey = c_nationkey
        |WHERE avg_bal = (SELECT m FROM mx)
        |ORDER BY n_name""".stripMargin),

    // O1/O4/O5 — top-k (Catalyst TakeOrderedAndProject: no full sort at scale)
    "q15_topk" -> same(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
      headline = true),

    // A6 — GROUP BY ALL (native on both engines)
    "q16_group_by_all" -> same(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ALL
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // O3 — ORDER BY ALL (native on both engines)
    "q17_order_by_all" -> same(
      """SELECT c_mktsegment, c_nationkey, count(*) AS n
        |FROM customer GROUP BY c_mktsegment, c_nationkey
        |ORDER BY ALL""".stripMargin),

    // W1 — ranking window (top-3 orders per customer)
    "q18_window_rank" -> same(
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
      headline = true),

    // W1 frames — running sum (identical add order ⇒ identical doubles)
    "q19_window_running" -> same(
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM events ORDER BY user_id, event_id""".stripMargin),

    // U1 — UNION ALL + re-aggregation
    "q20_union_all" -> same(
      """SELECT k, count(*) AS n FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION ALL SELECT s_nationkey AS k FROM supplier) t
        |GROUP BY k ORDER BY k""".stripMargin),

    // U1 — INTERSECT (set semantics on both engines)
    "q21_intersect" -> same(
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin),

    // F1–F6 — string function battery (BIGINT casts: DuckDB length/position
    // return BIGINT where Spark returns INT)
    "q22_string_funcs" -> sql(
      """SELECT p_partkey, upper(p_name) AS uname,
        |  substring(p_name, 1, 4) AS pre4,
        |  CAST(length(p_name) AS BIGINT) AS len,
        |  CAST(ascii(p_name) AS INT) AS a,
        |  split_part(p_name, ' ', 2) AS word2,
        |  CAST(position(' ' IN p_name) AS BIGINT) AS sp
        |FROM part ORDER BY p_partkey""".stripMargin,
      """SELECT p_partkey, upper(p_name) AS uname,
        |  substring(p_name, 1, 4) AS pre4,
        |  length(p_name) AS len,
        |  CAST(ascii(p_name) AS INT) AS a,
        |  split_part(p_name, ' ', 2) AS word2,
        |  position(' ' IN p_name) AS sp
        |FROM part ORDER BY p_partkey""".stripMargin),

    // F7 — regexp_extract (group 0 = whole match, '' on miss — both
    // engines); regexp_replace needs the 'g' flag on DuckDB to match
    // Spark's replace-all
    "q23_regexp" -> sql(
      """SELECT doc_id, regexp_extract(text, 'b[a-z]+', 0) AS m,
        |  regexp_replace(lang, '[aeiou]', '_') AS lr
        |FROM documents ORDER BY doc_id""".stripMargin,
      """SELECT doc_id, regexp_extract(text, 'b[a-z]+', 0) AS m,
        |  regexp_replace(lang, '[aeiou]', '_', 'g') AS lr
        |FROM documents ORDER BY doc_id""".stripMargin),

    // date_trunc bucketing + agg (cast to DATE: DuckDB's month-trunc yields
    // DATE, Spark's yields TIMESTAMP — normalize both sides)
    "q24_date_trunc" -> same(
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),

    // F10 — DuckDB boundary-crossing datediff vs our custom expression
    "q25_datediff_minute" -> sql(
      """SELECT user_id, duck_datediff('minute', min(ts), max(ts)) AS span_min,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
      """SELECT user_id, datediff('minute', min(ts), max(ts)) AS span_min,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),

    // F11 — `::` cast syntax (native in both parsers)
    "q26_cast_syntax" -> same(
      """SELECT l_quantity::BIGINT AS qi, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),

    // F14/F16/F17 — array build/index/slice (1-based element_at; DuckDB
    // brackets are 1-based too)
    "q27_array_funcs" -> sql(
      """SELECT doc_id,
        |  CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
        |  element_at(split(text, ' '), 1) AS first_tok,
        |  element_at(split(text, ' '), -1) AS last_tok,
        |  array_join(slice(split(text, ' '), 1, 3), '_') AS first3
        |FROM documents ORDER BY doc_id""".stripMargin,
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  string_split(text, ' ')[1] AS first_tok,
        |  string_split(text, ' ')[-1] AS last_tok,
        |  array_to_string(string_split(text, ' ')[1:3], '_') AS first3
        |FROM documents ORDER BY doc_id""".stripMargin),

    // F18 — JSON field extraction (->> on DuckDB, get_json_object on Spark)
    "q28_json_extract" -> sql(
      """SELECT event_id, CAST(get_json_object(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin),

    // S16 — reservoir-style exact-count sample. Sample MEMBERSHIP is
    // seeded-RNG-specific per engine, so the driver check covers the
    // sampling CONTRACT instead (the reference's own count-based
    // validation of dev.json:559): each engine draws its own 10%
    // sample and reports size, key-distinctness and the expected size —
    // all three agree cross-engine even though the sampled rows differ.
    // The size check is a ±1 CONTRACT, not raw counts: DuckDB's
    // reservoir(10%) rounds to nearest (1,501 rows → 150) while this
    // side takes ceil, so raw n_sample would diverge on any total not
    // divisible by 10 — the tolerant predicate is what both samplers
    // genuinely guarantee.
    "q29_sample" -> api((spark, sfDir) => {
      import org.apache.spark.sql.functions._
      val orders = Tables.load(spark, sfDir, "orders")
      val n = math.ceil(orders.count() * 0.1).toInt
      val sample = orders.orderBy(rand(42), col("o_orderkey")).limit(n)
      sample.agg(
          count(lit(1)).cast("long").as("n_sample"),
          countDistinct(col("o_orderkey")).cast("long").as("n_keys"))
        .crossJoin(orders.agg(
          count(lit(1)).cast("long").as("n_total")))
        .select(
          (abs(col("n_sample").cast("double")
            - col("n_total").cast("double") * 0.1) <= 1.0).as("size_ok"),
          (col("n_keys") === col("n_sample")).as("keys_distinct"),
          ceil(col("n_total").cast("double") * 0.1).cast("long")
            .as("n_expected"))
    },
      """WITH s AS (SELECT * FROM orders
        |           USING SAMPLE reservoir(10%) REPEATABLE (42)),
        |t AS (SELECT count(*) AS n_total FROM orders)
        |SELECT
        |  abs(CAST(count(*) AS DOUBLE)
        |    - CAST(n_total AS DOUBLE) * 0.1) <= 1.0 AS size_ok,
        |  count(DISTINCT o_orderkey) = count(*) AS keys_distinct,
        |  CAST(ceil(CAST(n_total AS DOUBLE) * 0.1) AS BIGINT)
        |    AS n_expected
        |FROM s, t GROUP BY n_total""".stripMargin),

    // P3 — * EXCLUDE through the dialect rewriter (oracle runs the DuckDB
    // text verbatim)
    "q30_exclude" -> duck(
      "SELECT * EXCLUDE (c_acctbal) FROM customer ORDER BY c_custkey"),

    // P4 — * REPLACE
    "q31_replace" -> duck(
      """SELECT * REPLACE (upper(c_mktsegment) AS c_mktsegment)
        |FROM customer ORDER BY c_custkey""".stripMargin),

    // P5 — COLUMNS('regex') projection
    "q32_columns_regex" -> duck(
      "SELECT COLUMNS('^c_(custkey|name)$') FROM customer ORDER BY c_custkey"),

    // F8/F9 — string bracket index + slice (duck_index/duck_slice)
    "q33_bracket_slice" -> duck(
      """SELECT doc_id, text[1:20] AS prefix20, lang[1] AS l1,
        |  source[2:] AS src_tail
        |FROM documents ORDER BY doc_id""".stripMargin),

    // C2 — bare FROM query
    "q34_bare_from" -> duck("FROM nation ORDER BY n_nationkey"),

    // F19/D15 — session settings. The engine-SEMANTIC settings (default
    // sort direction, default null order) are genuinely shared with
    // DuckDB — our dialect layer implements NULLS LAST default ordering
    // (O6) and ascending ORDER BY — so current_setting over them is
    // value-checked cross-engine. Host-specific settings (threads,
    // version) stay covered rows-only by Gold 27/30/70/71 and specs.
    "q35_settings" -> same(
      """SELECT current_setting('default_order') AS default_order,
        |  current_setting('default_null_order') AS default_null_order"""
        .stripMargin),

    // A10 — ROLLUP hierarchy totals (absent from the reference benchmark;
    // native on both engines, one shuffle with partial aggregation)
    "q36_rollup" -> same(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // A11 — distinct aggregate alongside plain aggregates (Catalyst
    // expands to a two-stage aggregation automatically)
    "q37_count_distinct" -> same(
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""
        .stripMargin),

    // NOT EXISTS → left-anti join (customers with no big-ticket order;
    // every customer has SOME order in the testdata, so the correlated
    // predicate is what makes the anti-join non-trivial)
    "q38_anti_join" -> same(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),

    // LEFT OUTER join + null-skipping count (the canonical "count per
    // parent incl. zero" shape). A preserved left side can't be the
    // broadcast build side, so both sides shuffle on the key — which is
    // the right plan at scale anyway (co-partitioned join + partial agg).
    "q39_outer_join" -> same(
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),

    // Ordered string aggregation: deterministic ORDER inside the
    // aggregate makes the concatenation engine-portable (an unordered
    // string_agg/collect_list depends on partitioning).
    "q72_string_agg" -> sql(
      """SELECT n_regionkey,
        |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""
        .stripMargin,
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name)
        |  AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""
        .stripMargin),

    // PIVOT: long→wide reshape. Sums go through DECIMAL inside the pivot
    // (order-independent), cast to DOUBLE by name outside. Spark's PIVOT
    // plans as a single aggregate over the pivot key — one shuffle, no
    // per-segment scans. Absent (nation, segment) combos are NULL on both
    // engines (sum over an empty group).
    "q76_pivot" -> sql(
      """SELECT c_nationkey,
        |  CAST(AUTOMOBILE AS DOUBLE) AS automobile,
        |  CAST(BUILDING AS DOUBLE) AS building,
        |  CAST(FURNITURE AS DOUBLE) AS furniture,
        |  CAST(HOUSEHOLD AS DOUBLE) AS household,
        |  CAST(MACHINERY AS DOUBLE) AS machinery
        |FROM (SELECT c_nationkey, c_mktsegment,
        |        CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer)
        |PIVOT (sum(bal) FOR c_mktsegment IN
        |  ('AUTOMOBILE' AS AUTOMOBILE, 'BUILDING' AS BUILDING,
        |   'FURNITURE' AS FURNITURE, 'HOUSEHOLD' AS HOUSEHOLD,
        |   'MACHINERY' AS MACHINERY))
        |ORDER BY c_nationkey""".stripMargin,
      """SELECT c_nationkey,
        |  CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
        |    THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS automobile,
        |  CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'
        |    THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS building,
        |  CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE'
        |    THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS furniture,
        |  CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD'
        |    THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS household,
        |  CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY'
        |    THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE)
        |    AS machinery
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""
        .stripMargin),

    // UNPIVOT: wide→long reshape (map-only — no shuffle at any scale;
    // the UNION ALL oracle formulation would scan the table once per
    // metric, the UNPIVOT plan scans once total).
    "q77_unpivot" -> sql(
      """SELECT p_partkey, metric, val FROM (
        |  SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
        |    p_retailprice AS price FROM part)
        |UNPIVOT (val FOR metric IN (size, price))
        |ORDER BY p_partkey, metric""".stripMargin,
      """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'price' AS metric, p_retailprice AS val
        |FROM part
        |ORDER BY p_partkey, metric""".stripMargin),

    // Generator/UNNEST: one row per token (LATERAL VIEW explode ↔
    // DuckDB unnest) — map-side expansion, pipelined with the scan.
    "q78_explode_tokens" -> sql(
      """SELECT doc_id, tok FROM documents
        |LATERAL VIEW explode(split(trim(text), '\\s+')) t AS tok
        |ORDER BY doc_id, tok""".stripMargin,
      """SELECT doc_id, u.tok AS tok
        |FROM documents,
        |  unnest(string_split_regex(trim(text), '\s+')) AS u(tok)
        |ORDER BY doc_id, tok""".stripMargin),

    // GROUPING SETS with grouping() disambiguators (generalizes q36's
    // ROLLUP): all four sets in ONE shuffle with partial aggregation —
    // Catalyst expands the sets map-side rather than re-scanning per set.
    "q79_grouping_sets" -> same(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status,
        |  l_returnflag NULLS LAST, l_linestatus NULLS LAST"""
        .stripMargin),

    // RANGE window frame over event-time: a sliding 1-hour sum keyed by
    // actual timestamps, not row positions. Frame bounds in epoch millis
    // (exact integers on both engines; DECIMAL sum ⇒ order-independent).
    "q80_window_range_frame" -> sql(
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY user_id ORDER BY unix_millis(ts)
        |    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS hour_sum
        |FROM events ORDER BY user_id, event_id""".stripMargin,
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_ms(ts)
        |    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS hour_sum
        |FROM events ORDER BY user_id, event_id""".stripMargin),

    // QUALIFY (DuckDB window filter) through the dialect rewriter — the
    // oracle runs the QUALIFY text verbatim; Spark gets the subquery
    // rewrite. Same top-2-per-customer shape as q18, so the rewrite is
    // value-checked against a native window-filter execution.
    "q81_qualify" -> duck(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) <= 2
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // Correlated EXISTS → left-semi join (the positive dual of q38's
    // NOT EXISTS anti join).
    "q82_exists_correlated" -> same(
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin),

    // Analytic-function battery: lead/lag/first_value/ntile over one
    // named window (unique (date, key) order ⇒ deterministic on both
    // engines; ntile is the SQL-standard bucket split on both).
    "q89_window_battery" -> same(
      """SELECT o_orderkey,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin),

    // TPC-H Q3 shape (shipping priority): selective dim filter broadcast
    // into two fact joins, grouped revenue, top-10.
    // Q3 plan note (r15 A/B, sf3sv, min of 3 — JoinAbProbe): the
    // canonical order (broadcast customer into orders, then shuffle
    // orders⋈lineitem on the orderkey) measured 4.56 s — the fact-fact
    // shuffle moves every 'BUILDING/pre-1997' order row AND every
    // post-1997-shipped lineitem row before the join drops ~90% of
    // them. THIS shape filters orders through the broadcast customer
    // join first (~10% survive: 1/5 segment × ~1/2 date window), then
    // broadcasts that filtered order set into the lineitem scan:
    // 1.21 s — the only shuffle left is the group-by over the ~5% of
    // lineitem rows that survive both the shipdate filter and the
    // join. The scale-safe dual (pre-aggregate lineitem by l_orderkey,
    // shuffle-join the filtered orders) measured 1.68 s.
    // r16 (the r15 verdict's plan-shape risk): the filtered-orders
    // side's BROADCAST hint is GATED on a footer-level size bound
    // (Queries.hintIfSliceSmall — the slice is O(fact), and an
    // unconditional hint would OOM the driver at 100× instead of
    // falling back). Under the cap the direct-broadcast plan runs
    // (0.74 s sf0.1); past it the hint drops and AQE's runtime
    // size-based conversion decides from MEASURED sizes — broadcast
    // when the slice is small (plan-asserted in QueriesSpec),
    // shuffle when it isn't. The structural win (filter orders
    // through the broadcast customer join before any fact shuffle)
    // holds on every path.
    // Irreducible-floor note (r16, sf30): the shipdate-filtered
    // revenue pass this query cannot avoid floors at 0.370 s; the
    // full entry runs 4.3-5.0 s vs DuckDB's 1.07 s at 32 threads
    // (4.7x). Past the broadcast cap the SHUFFLE_HASH fallback is
    // what keeps it there — the default sort-merge measured 40.9 s
    // (sorting ~150M surviving lineitem rows). Scan throughput is at
    // parity (q105); the residual is the one fact shuffle + probe —
    // the per-node cost a cluster divides, while DuckDB's number is
    // single-node-only.
    "q90_tpch_q3" -> api((spark, sfDir) => spark.sql {
      val h = factJoinHint(spark, sfDir, "orders", keepCols = 2,
        alias = "o")
      s"""WITH o AS (SELECT /*+ BROADCAST(customer) */
        |    o_orderkey, o_orderdate
        |  FROM orders JOIN customer ON c_custkey = o_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |SELECT ${h}o_orderkey,
        |  CAST(o_orderdate AS DATE) AS odate,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN o ON l_orderkey = o_orderkey
        |WHERE l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin
    },
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
      headline = true),

    // TPC-H Q5 shape (local-supplier volume): five joins; the
    // c_nationkey = s_nationkey predicate is the classic "local
    // supplier" join filter.
    // Q5 plan note (r15 A/B, sf3sv, min of 3 — JoinAbProbe): the
    // canonical order (shuffle full lineitem⋈orders on the orderkey,
    // dims broadcast) measured 1.83 s. THIS shape semi-reduces BOTH
    // shuffle sides before the one fact-fact join: lineitem first
    // joins the broadcast ASIA-supplier map (supplier⋈nation⋈region —
    // drops ~80% of lineitem and attaches s_nationkey/n_name, all
    // map-side), orders first joins broadcast customer under the
    // 2-year date window (attaches c_nationkey). The remaining
    // shuffle carries ~20% of lineitem as (orderkey, nationkey, amt)
    // narrow rows and ~30% of orders as (orderkey, nationkey):
    // 1.25 s. Broadcasting the filtered orders side instead measured
    // 1.87 s (the ~30% orders slice is too big to ship to every
    // task). Unlike Q3/Q10 this winner has NO fact-side broadcast —
    // the same plan is the 100 TB plan: both shuffle legs are
    // dimension-prefiltered fact slices, and the supplier prefilter
    // ratio (suppliers in one region / all) is scale-invariant.
    // r16 adds a size-gated SHUFFLE_HASH on the final leg join (see
    // the inline note and [[Queries.FactLegCapBytes]]).
    // Irreducible-floor note (r16, sf30): the two bare fact-leg
    // passes floor at 0.145 s (lineitem 3-col) + 0.175 s (windowed
    // orders count); the full entry runs 4.7-5.5 s vs DuckDB's
    // 1.41 s at 32 threads (3.9x). The residual is the two
    // dim-prefilter joins plus the one leg⋈leg shuffle join — all
    // partition-parallel on the cluster target.
    "q91_tpch_q5" -> api((spark, sfDir) => spark.sql {
      // r16: the final l⋈o fact-leg join defaults to sort-merge; past
      // [[FactLegCapBytes]] a SHUFFLE_HASH hint on the narrower o leg
      // skips both sorts (sf10sv 2.43→1.99 s, sf30 7.28→4.66 s;
      // sf3sv a wash and broadcast-o regresses — see cap note).
      val fh = if (sliceBytes(spark, sfDir, "orders", keepCols = 2)
          > FactLegCapBytes) "/*+ SHUFFLE_HASH(o) */ " else ""
      s"""WITH s AS (SELECT /*+ BROADCAST(nation, region) */
        |    s_suppkey, s_nationkey, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |l AS (SELECT /*+ BROADCAST(s) */ l_orderkey, s_nationkey,
        |    n_name, CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,6)) AS amt
        |  FROM lineitem JOIN s ON l_suppkey = s_suppkey),
        |o AS (SELECT /*+ BROADCAST(customer) */
        |    o_orderkey, c_nationkey
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT ${fh}n_name, CAST(sum(amt) AS DOUBLE) AS revenue
        |FROM l JOIN o ON l_orderkey = o_orderkey
        |  AND s_nationkey = c_nationkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
    },
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
      headline = true),

    // Fixed-width histogram by floor arithmetic (no engine-specific
    // width_bucket): map-side bucket compute + one tiny agg shuffle.
    "q97_histogram" -> same(
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),

    // CUBE over two dimensions (all four grouping sets in one shuffle;
    // completes the q36 ROLLUP / q79 GROUPING SETS family).
    "q98_cube" -> same(
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(grouping(c_nationkey) AS INT) AS g_nat,
        |  CAST(grouping(c_mktsegment) AS INT) AS g_seg,
        |  count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer GROUP BY CUBE(c_nationkey, c_mktsegment)
        |ORDER BY g_nat, g_seg, c_nationkey NULLS LAST,
        |  c_mktsegment NULLS LAST""".stripMargin),

    // Exact interpolated percentiles (Spark percentile == DuckDB
    // quantile_cont; the approximate variants are engine-specific and
    // live in SUMMARIZE).
    "q73_percentiles" -> sql(
      """SELECT l_returnflag,
        |  round(percentile(l_quantity, 0.5), 4) AS p50,
        |  round(percentile(l_quantity, 0.9), 4) AS p90,
        |  round(percentile(l_extendedprice, 0.99), 2) AS price_p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,
      // DOUBLE casts: on a DECIMAL-typed source quantile_cont returns
      // DECIMAL (losing the interpolation digits and the type match)
      """SELECT l_returnflag,
        |  round(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS p50,
        |  round(CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE), 4) AS p90,
        |  round(CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE), 2)
        |    AS price_p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin),

    // TPC-H Q6 shape — the canonical scan-aggregate: every predicate and
    // both referenced columns push down to the parquet scan (no join, no
    // shuffle beyond the single-row final agg). DECIMAL partials make the
    // sum order-independent at any parallelism.
    // r16, sf30 (tools/headtohead_sf30.json): 0.63 s vs DuckDB's
    // 0.66 s at 32 threads — ratio 0.96, scan-throughput parity on
    // the family's largest measured corpus.
    "q105_tpch_q6" -> same(
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.06
        |  AND l_quantity < 24""".stripMargin, headline = true),

    // TPC-H Q10 shape — returned-item top customers: the quarter filter
    // on orders cuts the fact join early, nation broadcasts (hint is a
    // comment to DuckDB), top-20 runs as TakeOrderedAndProject (no full
    // sort materialization).
    // Q10 plan note (r15 A/B, sf1/sf3sv quiet, median of 3): the
    // canonical join order (customer⋈orders⋈lineitem, DECIMAL
    // partials) measured 1018/1176 ms — the fact-fact shuffle carries
    // R-flag lineitem rows the 6-month o_orderdate filter later
    // drops. Three alternatives measured: (a) runtime bloom-filter
    // join (spark.sql.optimizer.runtime.bloomFilter, thresholds
    // lowered so it fires): 900/1531 ms — the bloom build pass costs
    // more than the shuffle it saves at in-memory scale (the conf's
    // 10 GB application-side default exists for exactly this reason,
    // and WOULD fire unaided at 100 TB); (b) broadcast the filtered
    // orders into lineitem, join customer after: 776/1165 ms;
    // (c) THIS shape — aggregate below the customer join (c_custkey
    // is customer's key, so grouping by o_custkey first is exact) and
    // broadcast the window-filtered orders: 521/869 ms. The residual
    // vs DuckDB is the bare scan floor: lineitem scan + R filter +
    // DECIMAL sum alone measures 582 ms at sf3sv, so the full-query
    // 869 ms is within 1.5x of the irreducible pass over the fact
    // table.
    // r16 (the r15 verdict's plan-shape risk): the 6-month orders
    // slice's BROADCAST hint is GATED on the same footer-level size
    // bound as q90 (Queries.hintIfSliceSmall) — it is O(fact), and an
    // unconditional hint would OOM the driver at 100× instead of
    // falling back. Past the cap the hint degrades to SHUFFLE_HASH on
    // the same side (per-partition builds — no fact-side sort, no
    // driver risk; see [[Queries.factJoinHint]]) — the la aggregate
    // stays below the customer join either way, which is the structural
    // win.
    // Irreducible-floor note (r16, sf30): the R-flag-filtered revenue
    // pass floors at 0.339 s; full entry 5.3 s vs DuckDB 1.31 s at 32
    // threads (4.0x) — same join-machinery residual as q90 (its note
    // has the breakdown).
    "q106_tpch_q10" -> api((spark, sfDir) => spark.sql {
      val h = factJoinHint(spark, sfDir, "orders", keepCols = 2,
        alias = "o")
      s"""WITH o AS (SELECT o_orderkey, o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'),
        |la AS (SELECT ${h}o_custkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,6))) AS rev
        |  FROM lineitem JOIN o ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R' GROUP BY o_custkey)
        |SELECT /*+ BROADCAST(nation) */ c_custkey, c_name, n_name,
        |  CAST(rev AS DOUBLE) AS revenue, c_acctbal
        |FROM la JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
    },
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  c_acctbal
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
      headline = true),

    // TPC-H Q12 shape (o_orderpriority standing in for l_shipmode):
    // integer CASE-sums are exact at any aggregation order/parallelism.
    "q107_tpch_q12" -> same(
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= o_orderdate
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // TPC-H Q14 shape — promo revenue share: conditional DECIMAL sums
    // (exact), single double division at the end; part broadcasts.
    "q108_tpch_q14" -> same(
      """SELECT /*+ BROADCAST(part) */ round(100.00 *
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE), 4) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin),

    // TPC-H Q16 shape — distinct-supplier counts with a NOT IN exclusion
    // subquery (anti-join) and a two-stage distinct aggregate.
    "q109_tpch_q16" -> same(
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""
        .stripMargin),

    // TPC-H Q18 shape — large-quantity orders: the IN subquery is a
    // groupBy-HAVING over the fact table (shuffle on l_orderkey reused
    // by the semi join), then enrich and top-100. l_quantity values are
    // integral, so double sums are exact here.
    "q110_tpch_q18" -> same(
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),

    // TPC-H Q19 shape — disjunctive brand/size/quantity predicates: the
    // OR of ANDs stays a single scan+broadcast-join (no union rewrite),
    // with the part-side conjuncts pushed into the scan.
    "q111_tpch_q19" -> same(
      """SELECT /*+ BROADCAST(part) */
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#11' AND p_size BETWEEN 10 AND 25
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#21' AND p_size BETWEEN 20 AND 40
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin),

    // TPC-H Q7 shape — cross-nation volume with TWO nation dimension
    // roles (supplier side + customer side, both broadcast) and a
    // disjunctive nation-pair predicate, grouped by shipment year.
    "q112_tpch_q7" -> same(
      """SELECT /*+ BROADCAST(sn), BROADCAST(cn) */
        |  sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS volume
        |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE ((sn.n_name = 'NATION_12' AND cn.n_name = 'NATION_11')
        |    OR (sn.n_name = 'NATION_11' AND cn.n_name = 'NATION_12'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),

    // TPC-H Q2 shape — argmin-per-group via a correlated scalar MIN
    // subquery (the testdata has no partsupp, so "suppliers of a part"
    // comes from lineitem). Catalyst decorrelates the subquery into an
    // aggregate + join on l_partkey, so the plan is two shuffles on the
    // same key, not a per-row probe. DISTINCT collapses the repeated
    // (part, supplier) pairs that lineitem naturally carries.
    "q121_tpch_q2" -> same(
      """SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name, s_acctbal
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE p_type = 'LARGE' AND p_size >= 40
        |  AND s_acctbal = (
        |    SELECT min(s2.s_acctbal)
        |    FROM supplier s2 JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
        |    WHERE l2.l_partkey = p_partkey)
        |ORDER BY s_acctbal, p_partkey, s_suppkey LIMIT 100"""
        .stripMargin),

    // TPC-H Q4 shape — EXISTS semi join: the correlated existence probe
    // becomes a left-semi hash join on l_orderkey; only orders in the
    // quarter window reach it (filter first, then semi).
    "q122_tpch_q4" -> same(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // TPC-H Q8 shape — market share: conditional share of a two-level
    // aggregate. All dims broadcast; DECIMAL partials keep both sums
    // exact so the final double division is deterministic.
    "q123_tpch_q8" -> same(
      """SELECT /*+ BROADCAST(customer, supplier, nation, region) */
        |  year(o_orderdate) AS o_year,
        |  round(CAST(sum(CASE WHEN sn.n_name = 'NATION_5'
        |      THEN CAST(l_extendedprice * (1 - l_discount)
        |        AS DECIMAL(18,6))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) /
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY year(o_orderdate) ORDER BY o_year""".stripMargin),

    // TPC-H Q9 shape — product-line profit by nation and year (cost side
    // proxied from p_retailprice since the testdata has no partsupp):
    // profit = revenue - 10% retail carrying cost, both DECIMAL partials.
    "q124_tpch_q9" -> same(
      """SELECT /*+ BROADCAST(part, supplier, nation) */
        |  n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,6)) -
        |    CAST(p_retailprice * l_quantity * 0.1 AS DECIMAL(18,6)))
        |    AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |WHERE p_name LIKE '%green%' OR p_type = 'PROMO'
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin),

    // TPC-H Q11 shape — group HAVING > scalar-subquery fraction of the
    // global total: two aggregations over the same scan, the global one
    // broadcast back as a one-row filter operand.
    "q125_tpch_q11" -> same(
      """SELECT l_partkey,
        |  CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2)))
        |    AS DOUBLE) AS value
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) >
        |  (SELECT sum(CAST(l_extendedprice * l_quantity
        |     AS DECIMAL(18,2))) * 0.0007 FROM lineitem)
        |ORDER BY value DESC, l_partkey LIMIT 100""".stripMargin),

    // TPC-H Q13 shape — customer order-count distribution: LEFT OUTER
    // join with an ON-clause filter on the right side (preserves
    // zero-order customers), then a second aggregation over the first.
    "q126_tpch_q13" -> same(
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""
        .stripMargin),

    // TPC-H Q15 shape — top supplier by revenue: the revenue CTE is used
    // twice (join input + scalar MAX); DECIMAL partials make the two
    // evaluations bit-identical so the equality filter is safe on DOUBLE.
    "q127_tpch_q15" -> same(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin),

    // TPC-H Q17 shape — small-quantity revenue below a correlated
    // per-part average: the correlated aggregate decorrelates to a
    // groupBy(l_partkey) joined back to the fact rows. The threshold is
    // sum(DECIMAL)/count (not avg) so both engines compute the identical
    // double before the comparison.
    "q128_tpch_q17" -> same(
      """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l_quantity < (
        |    SELECT 0.5 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
        |        AS DOUBLE) / count(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""
        .stripMargin),

    // TPC-H Q20 shape — semi join against a nested aggregate threshold:
    // suppliers that moved >60 units of one PROMO part in a year. The
    // IN probe list is itself a groupBy-HAVING (shuffle on the composite
    // key), then a broadcast semi into the 100-row supplier dim.
    "q129_tpch_q20" -> same(
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_type = 'PROMO'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(l_quantity) > 60)
        |ORDER BY s_suppkey""".stripMargin),

    // TPC-H Q21 shape ("the only supplier whose line was late on a
    // multi-supplier order"). Hand-decorrelated: the textbook EXISTS +
    // NOT EXISTS double correlation (still exercised by q38/q82/q122/
    // q131) would shuffle lineitem three times (main + semi + anti); the
    // equivalent form below pays the lineitem⋈orders join once: per-
    // (order, supplier) late-line counts, then per-order supplier
    // counts as a WINDOW over that aggregate (no self-join, no multi-
    // DISTINCT Expand) — EXISTS other supplier ⇔ n_supp >= 2, NOT
    // EXISTS other LATE supplier ⇔ n_late = 1 (the probe supplier
    // itself is late). numwait is the late-line total of the
    // qualifying (order, supplier) cells.
    "q130_tpch_q21" -> same(
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey,
        |    (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F'),
        |sup AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)
        |      AS late_lines
        |  FROM lo GROUP BY l_orderkey, l_suppkey),
        |w AS (
        |  SELECT l_suppkey, late_lines,
        |    count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
        |    sum(CASE WHEN late_lines > 0 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY l_orderkey) AS n_late
        |  FROM sup)
        |SELECT s_name, CAST(sum(late_lines) AS BIGINT) AS numwait
        |FROM w JOIN supplier ON s_suppkey = w.l_suppkey
        |WHERE w.late_lines > 0 AND w.n_supp >= 2 AND w.n_late = 1
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""
        .stripMargin),

    // TPC-H Q22 shape — anti join + ungrouped scalar average: customers
    // above the positive-balance average with no URGENT order (every
    // testdata customer has orders, so the anti probe filters on
    // priority). The average is sum(DECIMAL)/count for determinism; the
    // "country code" is the leading digit of the customer id.
    "q131_tpch_q22" -> same(
      """SELECT substring(c_name, 16, 1) AS cntrycode,
        |  count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2)))
        |        AS DOUBLE) / count(*)
        |    FROM customer c2 WHERE c2.c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderpriority = '1-URGENT')
        |GROUP BY substring(c_name, 16, 1) ORDER BY cntrycode"""
        .stripMargin),

    // Multiset set-ops + inline VALUES table: EXCEPT (distinct),
    // EXCEPT ALL (per-occurrence removal) and INTERSECT ALL complete
    // the q20/q21 set-op family; the VALUES CTE exercises inline
    // literal relations. All three run as hash set-op shuffles on the
    // single key column.
    "q142_except_values" -> same(
      """WITH v(seg) AS (VALUES ('BUILDING'), ('MACHINERY')),
        |hi AS (SELECT o_custkey FROM orders
        |       WHERE o_totalprice > 300000),
        |d AS (SELECT c_custkey FROM customer
        |      WHERE c_mktsegment IN (SELECT seg FROM v)
        |      EXCEPT SELECT o_custkey FROM hi),
        |m AS (SELECT o_custkey AS k FROM orders
        |      EXCEPT ALL SELECT o_custkey FROM hi),
        |i AS (SELECT o_custkey AS k FROM orders
        |      INTERSECT ALL
        |      SELECT o_custkey FROM orders
        |      WHERE o_orderpriority = '5-LOW')
        |SELECT (SELECT count(*) FROM d) AS n_except,
        |  (SELECT count(*) FROM m) AS n_except_all,
        |  (SELECT count(*) FROM i) AS n_intersect_all""".stripMargin),

    // Correlated LATERAL subquery with ORDER BY + LIMIT — top-2
    // customers per nation as a lateral probe. Catalyst decorrelates
    // the correlated limit into a partitioned rank filter (one window
    // pass over the customer shuffle), not a per-nation re-execution.
    "q143_lateral_topk" -> same(
      """SELECT n_name, t.c_name, t.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n_name, t.c_acctbal DESC, t.c_name""".stripMargin),

    // Distribution-rank analytics (percent_rank / cume_dist /
    // dense_rank) partitioned by segment — completes the q89 battery;
    // partitioned windows keep the sort local to each key at scale.
    "q144_pct_rank" -> same(
      """SELECT c_custkey,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  dense_rank() OVER w AS dr
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin)
  )
}
