package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's prompt-construction surface (eval/prompt_formatters.py
  * :8-226, registry eval/constants.py:11-17) as engine operators: the five
  * formatter strategies render a per-row instruction column into the exact
  * prompt text the reference's formatters produce.
  *
  * Spark-first shape: the schema text and retrieved context are driver-side
  * constants folded into literal prefix/suffix strings, so each prompt is
  * ONE codegen'd `concat` over the instruction column — map-only, zero
  * shuffle, no UDF. Prompt construction over a training corpus is a scan,
  * exactly like the text-analysis operators.
  *
  * format_all_tables shuffles table order (`random.shuffle`,
  * prompt_formatters.py:39) and memoizes the shuffle — here table order is
  * the caller's by default (reproducibility rule), and
  * [[formatAllTablesShuffled]] / `withPrompt(shuffleSeed = Some(n))`
  * reproduce the reference's permutation bit-for-bit for a seeded RNG via
  * [[graft.functions.PyRandom]] (CPython MT19937 fixtures pinned in
  * PromptOpsSpec). The chat
  * formatter's schema-explanation call (prompt_formatters.py:160-185) is an
  * LLM-orchestration hook (SURVEY §7.4 H5): injectable here, with a
  * deterministic default.
  */
object PromptOps {

  val styles: Seq[String] = Seq("rajkumar", "duckdb", "duckdbinst",
    "duckdbinstnoshort", "duckdbchat")

  /** CREATE TABLE rendering (prompt_formatters.py:20-31) with DuckDB type
    * names from the Spark schema (the reference reads them off its
    * Table/column metadata). */
  def formatTable(name: String, schema: StructType): String = {
    val cols = schema.fields.map(f =>
      s"    ${f.name} ${Summarize.duckTypeName(f.dataType)}")
    if (cols.nonEmpty) s"CREATE TABLE $name (\n${cols.mkString(",\n")}\n)"
    else s"CREATE TABLE $name"
  }

  /** prompt_formatters.py:34-43 minus the cached shuffle (see class doc). */
  def formatAllTables(tables: Seq[(String, StructType)]): String =
    tables.map { case (n, s) => formatTable(n, s) }.mkString("\n\n")

  /** format_all_tables WITH the reference's shuffle, reproducibly: the
    * table texts are permuted exactly as CPython's
    * `random.Random(seed).shuffle` would (prompt_formatters.py:39 runs
    * the module-level RNG once per memoization key; seeding that RNG and
    * rendering one prompt set is the replayable case this covers). The
    * shuffle is driver-side over a model-sized list; the result folds
    * into the same literal-concat plan as the deterministic path. */
  def formatAllTablesShuffled(tables: Seq[(String, StructType)],
      seed: Long): String =
    new graft.functions.PyRandom(seed)
      .shuffle(tables.map { case (n, s) => formatTable(n, s) })
      .mkString("\n\n")

  /** Retrieved-context block per style (format_retrieved_context,
    * prompt_formatters.py:46-52, 96-102); empty context ⇒ empty block. */
  def formatContext(style: String, context: Seq[String]): String =
    if (context.isEmpty) ""
    else {
      val joined = context.mkString("\n--------\n")
      style match {
        case "duckdbinst" | "duckdbinstnoshort" =>
          s"\n### Documentation:\n$joined\n"
        case "duckdbchat" =>
          "\n\nHere is additional documentation about DuckDB that could " +
            s"be useful.\n--------\n$joined\n--------\n"
        case _ =>
          "\n\n/*\nHere is additional documentation about DuckDB that " +
            s"could be useful.\n--------\n$joined\n--------\n*/"
      }
    }

  /** The (prefix, suffix) the style wraps around the instruction —
    * everything but the per-row question is constant, which is what makes
    * the whole formatter one literal concat per row. */
  def promptParts(style: String, tableText: String,
      contextText: String): (String, String) = style match {
    case "rajkumar" =>
      (s"$tableText\n\n\n-- Using valid DuckDB SQL, answer the following " +
        s"question for the tables provided above.$contextText\n\n-- ", "\n")
    case "duckdb" => // prompt_formatters.py:78-86 — rajkumar + sql fence
      (s"$tableText\n\n\n-- Using valid DuckDB SQL, answer the following " +
        s"question for the tables provided above.$contextText\n\n-- ",
        "\n```sql\n")
    case "duckdbinst" | "duckdbinstnoshort" =>
      // prompt_formatters.py:89-134
      val hasSchema =
        if (tableText.isEmpty) "." else ", given a duckdb database schema."
      val input =
        if (tableText.isEmpty) ""
        else "Here is the database schema that the SQL query will run " +
          s"on:\n$tableText\n"
      val response =
        if (style == "duckdbinst")
          "### Response (use duckdb shorthand if possible):\n"
        else "### Response:\n"
      ("### Instruction:\nYour task is to generate valid duckdb SQL to " +
        s"answer the following question$hasSchema\n\n### Input:\n$input" +
        s"$contextText\n### Question:\n", s"\n\n$response")
    case other =>
      throw new IllegalArgumentException(
        s"promptParts: unknown or non-scalar style '$other'")
  }

  /** Adds `outCol` with the fully formatted prompt for `questionCol` —
    * one codegen'd concat per row. */
  def withPrompt(df: DataFrame, questionCol: String, style: String,
      tables: Seq[(String, StructType)], context: Seq[String] = Nil,
      outCol: String = "prompt",
      shuffleSeed: Option[Long] = None): DataFrame = {
    val tableText = shuffleSeed match {
      case Some(s) => formatAllTablesShuffled(tables, s)
      case None => formatAllTables(tables)
    }
    val (pre, post) = promptParts(style, tableText,
      formatContext(style, context))
    df.withColumn(outCol, concat(lit(pre), col(questionCol), lit(post)))
  }

  /** Chat-style messages (DuckDBChat, prompt_formatters.py:137-215):
    * array<struct<role,content>> per row. `explainSchema` is the
    * reference's LLM schema-summary hook — injectable, deterministic
    * default echoes the schema (the orchestration itself is out of
    * engine, SURVEY §7.4 H5). */
  def withChatPrompt(df: DataFrame, questionCol: String,
      tables: Seq[(String, StructType)], context: Seq[String] = Nil,
      explainSchema: String => String = s =>
        s"The database contains the tables defined by:\n$s",
      outCol: String = "messages"): DataFrame = {
    val tableText = formatAllTables(tables)
    val contextText = formatContext("duckdbchat", context)
    val system = "You are a helpful assistant that can generate DuckDB " +
      "sql queries, which is a superset of Postgresql, based on the user " +
      "input. You do not respond with any human readable text, only SQL " +
      "code."
    val schemaAsk = s"SQL schema of my database:\n$tableText\nExplain in " +
      "a few sentences what the data is about:\n        "
    val finalPre = "Now output a single SQL query without any " +
      "explanation and do not add anything \nto the query that was not " +
      "part of the question, also do not use markdown. Make sure to " +
      "only \nuse information provided in the prompt, or tables and " +
      "columns from the schema above and write a query to answer the " +
      s"question.$contextText\n\nMy quesiton is \n`"
    val finalPost = "`\n\nGenerate the DuckDB specific SQL query:"
    def msg(role: String, content: Column) =
      struct(lit(role).as("role"), content.as("content"))
    df.withColumn(outCol, array(
      msg("system", lit(system)),
      msg("user", lit(schemaAsk)),
      msg("assistant", lit(explainSchema(tableText))),
      msg("user", concat(lit(finalPre), col(questionCol), lit(finalPost)))))
  }

  // ---- H6: SQL post-processing (model output → executable SQL) ----
  // eval/text_to_sql.py:18-20 (clean_whitespace), :160-163 (stop-token
  // truncation), eval/data_utils.py:69-80 (clean_str). Each is a
  // codegen'd string expression — map-only over the output column.

  /** Truncates at the first occurrence of each stop sequence, applied
    * in order (text_to_sql.py:162-163 `sql_query.split(token)[0]`). */
  def truncateAtStops(c: Column, stops: Seq[String]): Column =
    stops.foldLeft(c)((acc, s) => substring_index(acc, s, 1))

  /** Collapses whitespace runs to one space (text_to_sql.py:18-20).
    * `(?U)` makes Java's `\s` Unicode-aware like Python's — the
    * reference collapses U+00A0-style whitespace too, and scraped
    * model output carries it. */
  def cleanWhitespace(c: Column): Column =
    regexp_replace(c, "(?U)[\\t\\n\\s]+", " ")

  /** The reference's question cleaner (data_utils.py:69-80), steps in
    * the reference's order: non-ASCII → space, doubled-quote escapes
    * dropped, double quote → single, tab/space runs collapsed, trim. */
  def cleanStr(c: Column): Column = {
    val ascii = regexp_replace(c, "[^\\x00-\\x7f]", " ")
    val noSq = regexp_replace(ascii, "''", " ")
    val noBq = regexp_replace(noSq, "``", " ")
    val dq = regexp_replace(noBq, "\"", "'")
    trim(regexp_replace(dq, "[\\t ]+", " "))
  }

  /** Model-output extraction (eval/predict.py:83-91): strip, `<>` →
    * `!=`, and take what follows the last `|` (models trained on
    * `<db> | <sql>` pairs emit the prefix). The reference's replace
    * discards its result (predict.py:87 — a straight bug, the repaired
    * string is never assigned); this implements the evident intent. */
  def extractSql(c: Column): Column =
    trim(substring_index(regexp_replace(trim(c), "<>", "!="), "|", -1))

  /** H13 set-overlap precision/recall/F1 (eval/metric_utils.py:15-20)
    * over two array columns, with the reference's zero-denominator
    * conventions. Inputs pass through array_distinct so array columns
    * behave as the Python sets the reference takes. */
  def setPrf(gold: Column, pred: Column): Column = {
    val g = array_distinct(gold)
    val p = array_distinct(pred)
    val inter = size(array_intersect(g, p)).cast("double")
    val prec = when(size(p) === 0, 0.0).otherwise(inter / size(p))
    val rec = when(size(g) === 0, 0.0).otherwise(inter / size(g))
    val f1 = when(prec + rec === 0.0, 0.0)
      .otherwise(lit(2.0) * prec * rec / (prec + rec))
    struct(prec.as("prec"), rec.as("recall"), f1.as("f1"))
  }

  /** Keyword and builtin-function tokens the casing canonicalizer
    * uppercases (the words sqlglot's renderer capitalizes in typical
    * text-to-SQL output). */
  private val sqlKeywords: Set[String] = Set(
    "select", "from", "where", "group", "by", "order", "having", "limit",
    "offset", "join", "inner", "left", "right", "full", "outer", "cross",
    "on", "as", "and", "or", "not", "in", "like", "ilike", "between",
    "is", "null", "distinct", "case", "when", "then", "else", "end",
    "union", "all", "except", "intersect", "with", "insert", "into",
    "values", "update", "set", "delete", "create", "table", "view", "if",
    "exists", "drop", "alter", "asc", "desc", "using", "natural", "cast",
    "any", "some", "true", "false",
    "count", "sum", "avg", "min", "max", "abs", "round", "floor", "ceil",
    "coalesce", "nullif", "substring", "replace", "trim", "lower",
    "upper", "length", "concat", "position", "datediff", "date_trunc",
    "extract", "split_part")

  /** The shared uppercase-keyword convention, for the parse→render
    * normalizer ([[graft.dialect.SqlNormalizer]]). */
  private[graft] def isCasedKeyword(lowerWord: String): Boolean =
    sqlKeywords(lowerWord)

  /** H11 — SQL keyword-casing canonicalization: the observable effect of
    * the reference's sqlglot roundtrip on the optional
    * `--correct-sql-casing` metric (eval/metric_utils.py:9-12, applied
    * to gold and predicted SQL at eval/evaluate.py:326-329). One
    * quote-aware scan: single-quoted literals (with `''` escapes) and
    * double-quoted identifiers pass through verbatim; word tokens in
    * the keyword/function set uppercase; everything else is untouched.
    * Declared divergence from sqlglot: it re-renders whitespace and
    * decides function-vs-identifier by grammar — this scan keeps
    * spacing as-is (the evaluator collapses whitespace before the
    * metric anyway, evaluate.py:316-325) and decides by token set, so
    * it is a pure CASING transform: `out.equalsIgnoreCase(in)` always
    * holds (pinned in PromptOpsSpec over every dev.json query). */
  def correctCasingString(sql: String): String = {
    if (sql == null) return null
    val n = sql.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c
        sb.append(c); i += 1
        var open = true
        while (i < n && open) {
          val d = sql.charAt(i); sb.append(d); i += 1
          if (d == q) {
            if (i < n && sql.charAt(i) == q) { sb.append(q); i += 1 }
            else open = false
          }
        }
      } else if (Character.isLetter(c) || c == '_') {
        val start = i
        while (i < n && (Character.isLetterOrDigit(sql.charAt(i)) ||
            sql.charAt(i) == '_')) i += 1
        val w = sql.substring(start, i)
        sb.append(
          if (sqlKeywords(w.toLowerCase(java.util.Locale.ROOT)))
            w.toUpperCase(java.util.Locale.ROOT)
          else w)
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
