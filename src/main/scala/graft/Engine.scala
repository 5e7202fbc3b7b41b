package graft

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField
import graft.dialect.DuckRewriter
import graft.functions.GraftFunctions
import graft.operators.Summarize

/** Session façade: the full DuckDB-style command surface over Spark
  * (SURVEY.md §2.7 D1-D17, §4 item 3). Queries flow through the dialect
  * rewriter into `spark.sql`; commands Spark SQL cannot express (COPY,
  * ATTACH, SUMMARIZE, PRAGMA, DML on view-backed tables) are driver-side
  * operations on a mutable name → DataFrame catalog.
  *
  * DML strategy — rematerialization: tables live as temp views over
  * DataFrames; UPDATE/ALTER/DELETE/INSERT re-derive the DataFrame and
  * re-register it. Plans stay lazy (nothing materializes until read), so
  * a chain of DML is one fused Catalyst plan at read time. This is the
  * right shape for the reference's ≤1k-row DDL fixtures; at warehouse
  * scale mutation belongs to a table format (the read path — parquet
  * scans with pushdown — is the 100 TB path, and is unaffected).
  */
class Engine(val spark: SparkSession) {
  GraftFunctions.register(spark)

  /** table name (lowercase) → current DataFrame */
  private val tables = mutable.LinkedHashMap.empty[String, DataFrame]
  /** attached database alias → table names */
  private val attached = mutable.LinkedHashMap.empty[String, Seq[String]]

  private def norm(name: String): String =
    name.toLowerCase.stripPrefix("\"").stripSuffix("\"")

  def register(name: String, df: DataFrame): Unit = {
    val n = norm(name)
    tables(n) = df
    // temp views are single-part; dotted (attached-catalog) names resolve
    // through the Engine's own map and an underscored alias view
    if (n.contains('.')) df.createOrReplaceTempView(n.replace('.', '_'))
    else df.createOrReplaceTempView(n)
  }

  def table(name: String): DataFrame =
    tables.getOrElse(norm(name), spark.table(norm(name)))

  private def schemaOf: String => Option[Seq[String]] = t =>
    scala.util.Try(table(t).columns.toSeq).toOption

  // ---- command patterns (case-insensitive, dotall) -----------------------
  private val CreateTableAs =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+AS\s+(.+)""".r
  private val CreateTable =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((.+)\)\s*""".r
  private val InsertValues =
    """(?is)\s*INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\))?\s*VALUES\s*(.+)""".r
  private val InsertSelect =
    """(?is)\s*INSERT\s+INTO\s+([\w.]+)\s+(SELECT\b.+|FROM\b.+)""".r
  private val Update =
    """(?is)\s*UPDATE\s+([\w.]+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?\s*""".r
  private val Delete =
    """(?is)\s*DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.+))?\s*""".r
  private val AlterAdd =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMN\s+(\w+)\s+(.+?)\s*""".r
  private val AlterType =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+(?:COLUMN\s+)?(\w+)\s+(?:SET\s+DATA\s+)?TYPE\s+(.+?)\s*""".r
  private val DropTable =
    """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*""".r
  private val CopyTo =
    """(?is)\s*COPY\s+(\([^)]+\)|[\w.]+)\s+TO\s+'([^']+)'\s*(?:\((.*)\))?\s*""".r
  private val CopyFrom =
    """(?is)\s*COPY\s+([\w.]+)\s*(?:\(([^)]*)\))?\s+FROM\s+'([^']+)'\s*(?:\((.*)\))?\s*""".r
  private val AttachCmd =
    """(?is)\s*ATTACH\s+(?:DATABASE\s+)?'([^']+)'(?:\s+AS\s+(\w+))?\s*""".r
  private val SetCmd =
    """(?is)\s*(?:SET|PRAGMA)\s+(\w+)\s*=\s*'?([^';]*?)'?\s*""".r
  private val PragmaShowTables = """(?is)\s*PRAGMA\s+show_tables\s*""".r
  private val PragmaTableInfo =
    """(?is)\s*PRAGMA\s+table_info\s*\(\s*'?([\w.]+?)'?\s*\)\s*""".r
  private val PragmaDbList = """(?is)\s*PRAGMA\s+database_list\s*""".r
  private val CallVersion =
    """(?is)\s*CALL\s+pragma_version\s*\(\s*\)\s*""".r
  private val SummarizeCmd = """(?is)\s*SUMMARIZE\s+([\w.]+)\s*""".r
  private val DescribeCmd = """(?is)\s*DESCRIBE\s+([\w.]+)\s*""".r

  /** Executes one DuckDB-dialect statement; returns the result (commands
    * return a small status/empty frame, like DuckDB). */
  def executeDuck(sqlText: String): DataFrame = sqlText match {
    case CreateTableAs(name, query) =>
      register(name, executeDuck(query)); empty()
    case CreateTable(name, colDefs) =>
      val ddl = DuckRewriter.rewrite(colDefs, schemaOf)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        normalizeDdl(ddl))
      register(name, spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
      empty()
    case InsertValues(name, colsOpt, values) =>
      val target = table(name)
      val cols = Option(colsOpt).map(_.split(",").map(_.trim.toLowerCase))
        .getOrElse(target.columns.map(_.toLowerCase))
      val rows = spark.sql(
        s"SELECT * FROM (VALUES ${DuckRewriter.rewrite(values, schemaOf)})")
        .toDF(cols.toIndexedSeq: _*)
      // align: missing columns → typed NULL; cast to target types
      val aligned = target.schema.fields.map { f: StructField =>
        if (cols.contains(f.name.toLowerCase))
          col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
      register(name, target.unionByName(rows.select(aligned.toIndexedSeq: _*),
        allowMissingColumns = false))
      empty()
    case InsertSelect(name, query) =>
      val target = table(name)
      val rows = executeDuck(query).toDF(target.columns.toIndexedSeq: _*)
      val casted = target.schema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name))
      register(name, target.unionByName(rows.select(casted.toIndexedSeq: _*)))
      empty()
    case Update(name, setList, whereOpt) =>
      val target = table(name)
      val cond = Option(whereOpt)
        .map(w => expr(DuckRewriter.rewrite(w, schemaOf))).getOrElse(lit(true))
      val sets = DuckRewriter.splitTop(setList).map { a =>
        val Array(c, v) = a.split("=", 2)
        norm(c.trim) -> expr(DuckRewriter.rewrite(v.trim, schemaOf))
      }.toMap
      val updated = target.schema.fields.foldLeft(target) { (df, f) =>
        sets.get(f.name.toLowerCase) match {
          case Some(v) => df.withColumn(f.name,
            when(cond, v.cast(f.dataType)).otherwise(col(f.name)))
          case None => df
        }
      }
      register(name, updated); empty()
    case Delete(name, whereOpt) =>
      val target = table(name)
      val keep = Option(whereOpt)
        .map(w => !expr(DuckRewriter.rewrite(w, schemaOf))).getOrElse(lit(false))
      register(name, target.where(keep)); empty()
    case AlterAdd(name, colName, typ) =>
      register(name, table(name).withColumn(colName,
        lit(null).cast(normalizeType(typ)))); empty()
    case AlterType(name, colName, typ) =>
      register(name, table(name).withColumn(colName,
        col(colName).cast(normalizeType(typ)))); empty()
    case DropTable(name) =>
      tables.remove(norm(name))
      spark.catalog.dropTempView(norm(name)); empty()
    case CopyTo(src, path, optsOpt) =>
      val df = if (src.startsWith("("))
        executeDuck(src.stripPrefix("(").stripSuffix(")"))
      else table(src)
      val opts = copyOptions(optsOpt)
      val fmt = opts.getOrElse("format",
        if (path.endsWith(".parquet")) "parquet"
        else if (path.endsWith(".json")) "json" else "csv")
      val w0 = df.write.mode("overwrite")
      val w = opts.get("partition_by") match {
        case Some(cols) => w0.partitionBy(cols.split(",").map(_.trim): _*)
        case None => w0
      }
      fmt match {
        case "parquet" => w.parquet(path)
        case "json" => w.json(path)
        case _ =>
          // CSV holds scalars only: complex columns serialize as JSON
          // text (DuckDB's COPY writes its list/struct repr similarly)
          val flat = df.select(df.schema.fields.map { f =>
            f.dataType match {
              case _: org.apache.spark.sql.types.ArrayType |
                   _: org.apache.spark.sql.types.StructType |
                   _: org.apache.spark.sql.types.MapType =>
                to_json(col(f.name)).as(f.name)
              case _ => col(f.name)
            }
          }.toIndexedSeq: _*)
          flat.write.mode("overwrite").option("header", "true")
            .option("sep", opts.getOrElse("delimiter", ",")).csv(path)
      }
      empty()
    case CopyFrom(name, colsOpt, path, optsOpt) =>
      val target = table(name)
      val opts = copyOptions(optsOpt)
      val fmt = opts.getOrElse("format",
        if (path.endsWith(".parquet")) "parquet"
        else if (path.endsWith(".json")) "json" else "csv")
      val incomingCols = Option(colsOpt)
        .map(_.split(",").map(_.trim.toLowerCase).toSeq)
        .getOrElse(target.columns.map(_.toLowerCase).toSeq)
      val readSchema = org.apache.spark.sql.types.StructType(
        target.schema.fields.filter(f =>
          incomingCols.contains(f.name.toLowerCase)))
      val in = fmt match {
        case "parquet" => spark.read.parquet(path)
        case "json" => spark.read.schema(readSchema).json(path)
        case _ =>
          // complex columns travel as JSON text in CSV (see CopyTo)
          import org.apache.spark.sql.types._
          val flatSchema = StructType(readSchema.fields.map {
            case f @ StructField(_, _: ArrayType | _: StructType |
                _: MapType, _, _) => f.copy(dataType = StringType)
            case f => f
          })
          val raw = spark.read.schema(flatSchema).option("header", "true")
            .option("sep", opts.getOrElse("delimiter", ",")).csv(path)
          raw.select(readSchema.fields.map { f =>
            f.dataType match {
              case _: ArrayType | _: StructType | _: MapType =>
                from_json(col(f.name), f.dataType).as(f.name)
              case _ => col(f.name)
            }
          }.toIndexedSeq: _*)
      }
      // column-subset COPY: absent columns land as typed NULLs (S10)
      val aligned = target.schema.fields.map { f =>
        if (in.columns.map(_.toLowerCase).contains(f.name.toLowerCase))
          col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
      register(name, target.unionByName(in.select(aligned.toIndexedSeq: _*)))
      empty()
    case AttachCmd(path, aliasOpt) =>
      val alias = Option(aliasOpt).getOrElse(
        new java.io.File(path).getName.replaceAll("\\.[^.]*$", ""))
      val dir = new java.io.File(path)
      val names =
        if (dir.isDirectory)
          dir.listFiles.filter(_.getName.endsWith(".parquet")).toSeq
            .map { f =>
              val t = f.getName.stripSuffix(".parquet")
              register(s"$alias.$t", spark.read.parquet(f.getPath))
              t
            }
        else Seq.empty
      attached(alias) = names
      empty()
    case PragmaShowTables() =>
      import spark.implicits._
      tables.keys.toSeq.sorted.toDF("name")
    case PragmaTableInfo(name) =>
      import spark.implicits._
      table(name).schema.fields.zipWithIndex.map { case (f, i) =>
        (i, f.name, Summarize.duckTypeName(f.dataType),
          !f.nullable, Option.empty[String], false)
      }.toSeq.toDF("cid", "name", "type", "notnull", "dflt_value", "pk")
    case PragmaDbList() =>
      import spark.implicits._
      (Seq("memory") ++ attached.keys.toSeq).zipWithIndex
        .map { case (n, i) => (i.toLong, n, "") }
        .toDF("seq", "name", "file")
    case SetCmd(key, value) =>
      spark.conf.set(s"graft.setting.$key", value)
      key match { // DuckDB knobs with direct Spark equivalents
        case "threads" =>
          spark.conf.set("spark.sql.shuffle.partitions", value)
        case _ =>
      }
      empty()
    case CallVersion() =>
      spark.sql("SELECT pragma_version() AS `version`")
    case SummarizeCmd(name) => Summarize.summarize(table(name))
    case DescribeCmd(name) => Summarize.describe(table(name))
    case query =>
      spark.sql(DuckRewriter.rewrite(query, schemaOf))
  }

  private def copyOptions(optsOpt: String): Map[String, String] =
    Option(optsOpt).map { o =>
      DuckRewriter.splitTop(o).flatMap { kv =>
        kv.trim.split("\\s+", 2) match {
          case Array(k, v) => Some(k.toLowerCase ->
            v.trim.stripPrefix("'").stripSuffix("'")
              .stripPrefix("(").stripSuffix(")").toLowerCase)
          case _ => None
        }
      }.toMap
    }.getOrElse(Map.empty)

  /** DuckDB type spellings → Spark DDL (VARCHAR[n] / FLOAT[k] / STRUCT). */
  private def normalizeType(t0: String): String = {
    val t = t0.trim
    val arrayRe = """(?i)(\w+)\s*\[\s*\d*\s*\]""".r
    val structRe = """(?is)STRUCT\s*\((.+)\)""".r
    t match {
      case arrayRe(el) => s"array<${normalizeType(el)}>"
      case structRe(fields) =>
        val fs = DuckRewriter.splitTop(fields).map { f =>
          val parts = f.trim.split("\\s+", 2)
          s"${parts(0)}:${normalizeType(parts(1))}"
        }
        s"struct<${fs.mkString(",")}>"
      case other => other
        .replaceAll("(?i)\\bvarchar\\s*\\(\\s*\\d+\\s*\\)", "string")
        .replaceAll("(?i)\\bvarchar\\b|\\btext\\b|\\bchar\\b", "string")
        .replaceAll("(?i)\\bdatetime\\b", "timestamp")
    }
  }

  private def normalizeDdl(colDefs: String): String =
    DuckRewriter.splitTop(colDefs).map { d =>
      val parts = d.trim.split("\\s+", 2)
      s"${parts(0)} ${normalizeType(parts.lift(1).getOrElse("string"))}"
    }.mkString(", ")

  private def empty(): DataFrame = spark.emptyDataFrame
}
