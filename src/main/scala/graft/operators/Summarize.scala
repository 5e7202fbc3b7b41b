package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `SUMMARIZE t` — DuckDB's per-column profile (reference
  * eval/data/dev.json:191,551) re-expressed as ONE aggregation pass:
  * every statistic for every column is computed in a single `agg`, so the
  * input is scanned once regardless of column count (the naive
  * per-column loop would scan N times — fatal at 100 TB).
  *
  * Output matches DuckDB 0.9 SUMMARIZE's column set: column_name,
  * column_type (DuckDB type names), min, max, approx_unique, avg, std,
  * q25, q50, q75, count, null_percentage. The per-column pivot happens on
  * the collected 1-row aggregate — driver-side size is O(columns), never
  * O(rows). */
object Summarize {

  /** Spark → DuckDB type-name mapping (shared with DESCRIBE). */
  def duckTypeName(dt: DataType): String = dt match {
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case _: DecimalType => "DECIMAL"
    case StringType => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    // DuckDB's TIMESTAMP has no zone; both Spark flavors map to it
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case BinaryType => "BLOB"
    case ArrayType(e, _) => duckTypeName(e) + "[]"
    case StructType(fields) =>
      fields.map(f =>
          s"${quoteIfKeyword(f.name)} ${duckTypeName(f.dataType)}")
        .mkString("STRUCT(", ", ", ")")
    case other => other.sql
  }

  /** DuckDB double-quotes keyword-colliding identifiers when rendering
    * nested type names. */
  private val duckKeywordish = Set("name", "type", "order", "group",
    "user", "table", "select", "values", "key", "default", "end", "start",
    "text", "value")
  private def quoteIfKeyword(name: String): String =
    if (duckKeywordish(name.toLowerCase)) s""""$name"""" else name

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  def summarize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cols = df.schema.fields
    // aliases are POSITIONAL (c0__min, c1__min, …), never name-derived:
    // a column literally named "x__min" next to "x", or a dotted name,
    // must not collide with or break the generated stat slots; column
    // references go through df(_) so dots resolve as literal names
    val aggs = cols.zipWithIndex.flatMap { case (f, ci) =>
      val c = df(f.name)
      val base = Seq(
        min(c).cast("string").as(s"c${ci}__min"),
        max(c).cast("string").as(s"c${ci}__max"),
        approx_count_distinct(c).as(s"c${ci}__uniq"),
        count(c).as(s"c${ci}__cnt"))
      val numeric =
        if (isNumeric(f.dataType)) Seq(
          avg(c.cast("double")).as(s"c${ci}__avg"),
          stddev_samp(c.cast("double")).as(s"c${ci}__std"),
          percentile_approx(c.cast("double"), lit(0.25), lit(10000))
            .as(s"c${ci}__q25"),
          percentile_approx(c.cast("double"), lit(0.5), lit(10000))
            .as(s"c${ci}__q50"),
          percentile_approx(c.cast("double"), lit(0.75), lit(10000))
            .as(s"c${ci}__q75"))
        else Seq.empty
      base ++ numeric
    } :+ count(lit(1)).as("__total")

    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def get[T](name: String): Option[T] = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(r.getAs[T](i))
    }
    val total = r.getAs[Long]("__total")

    val rows = cols.zipWithIndex.map { case (f, ci) =>
      val cnt = get[Long](s"c${ci}__cnt").getOrElse(0L)
      val nullPct =
        if (total == 0) 0.0
        else BigDecimal((total - cnt) * 100.0 / total)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      Row(f.name, duckTypeName(f.dataType),
        get[String](s"c${ci}__min").orNull,
        get[String](s"c${ci}__max").orNull,
        get[Long](s"c${ci}__uniq").getOrElse(0L),
        if (isNumeric(f.dataType)) get[Double](s"c${ci}__avg").orNull
        else null,
        if (isNumeric(f.dataType)) get[Double](s"c${ci}__std").orNull
        else null,
        if (isNumeric(f.dataType)) get[Double](s"c${ci}__q25").orNull
        else null,
        if (isNumeric(f.dataType)) get[Double](s"c${ci}__q50").orNull
        else null,
        if (isNumeric(f.dataType)) get[Double](s"c${ci}__q75").orNull
        else null,
        total, nullPct)
    }
    val schema = StructType(Seq(
      StructField("column_name", StringType, nullable = false),
      StructField("column_type", StringType, nullable = false),
      StructField("min", StringType),
      StructField("max", StringType),
      StructField("approx_unique", LongType, nullable = false),
      StructField("avg", DoubleType),
      StructField("std", DoubleType),
      StructField("q25", DoubleType),
      StructField("q50", DoubleType),
      StructField("q75", DoubleType),
      StructField("count", LongType, nullable = false),
      StructField("null_percentage", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** Exact per-column profile (count / nulls / distinct / min / max /
    * avg) in ONE scan: every stat for every column is an aggregate slot
    * of a single agg row, unpivoted with stack(). Unlike [[summarize]]
    * (sketch stats, rows-only check) each stat here is exact and
    * order-independent — DECIMAL sums make avg deterministic at any
    * parallelism — so the operator is value-checked against a DuckDB
    * oracle. Distributed: one partial+final agg, no driver collect. */
  def exactStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.zipWithIndex.flatMap { case (name, i) =>
      val c = df(name)
      Seq(count(c).as(s"cnt$i"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"nul$i"),
        countDistinct(c).as(s"dst$i"),
        min(c.cast("double")).as(s"min$i"),
        max(c.cast("double")).as(s"max$i"),
        sum(c.cast("decimal(18,6)")).as(s"sum$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex.map { case (name, i) =>
      s"'$name', cnt$i, nul$i, dst$i, min$i, max$i, " +
        s"CAST(CAST(sum$i AS DOUBLE) / cnt$i AS DOUBLE)"
    }.mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
      "(column_name, n, n_null, n_distinct, min, max, avg)")
  }

  /** `DESCRIBE t` with DuckDB-style output columns. `notNull` overrides
    * nullability for formats that can't carry constraints. */
  def describe(df: DataFrame, notNull: Set[String] = Set.empty,
      declared: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    val rows = df.schema.fields.map { f =>
      val nullable = f.nullable && !notNull(f.name.toLowerCase)
      Row(f.name,
        declared.getOrElse(f.name.toLowerCase, duckTypeName(f.dataType)),
        if (nullable) "YES" else "NO", null, null, null)
    }
    val schema = StructType(Seq(
      StructField("column_name", StringType, nullable = false),
      StructField("column_type", StringType, nullable = false),
      StructField("null", StringType, nullable = false),
      StructField("key", StringType),
      StructField("default", StringType),
      StructField("extra", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}
