package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, GraftHtml}

/** HTML main-content extraction semantics (GraftHtml.extractMain): the
  * edge cases the single-pass scanner must share with the
  * html.parser-stack fixture generator, plus full-fixture parity and
  * the codegen plan shape. */
class HtmlOpsSpec extends SparkSpecBase {

  private def x(s: String): String = GraftHtml.extractMainString(s)

  test("tag strip, entity decode and whitespace collapse") {
    assert(x("<p>a  &amp; b</p> <p>c&nbsp;d</p>") == "a & b c d")
    assert(x("plain text, no markup") == "plain text, no markup")
    assert(x("x &lt;tag&gt; &quot;q&quot; &apos;a&apos;") ==
      "x <tag> \"q\" 'a'")
    assert(x("&#65;&#x42;c") == "ABc")
    assert(x("&zzz; stays &amp1; literal") == "&zzz; stays &amp1; literal")
  }

  test("script/style/comment subtrees vanish; raw mode ignores fake tags") {
    assert(x("a<script>var x = '<p>not text</p>' && 1 > 0;</script>b")
      == "ab")
    assert(x("a<style>.c{content:'<div>'}</style>b") == "ab")
    assert(x("a<!-- <p>gone</p> &amp; -->b") == "ab")
    assert(x("a<script>x</script >b<script>y</ script>c") == "abc")
  }

  test("boilerplate subtrees drop, including nested ones") {
    assert(x("<body><nav>menu <b>home</b></nav>keep</body>") == "keep")
    assert(x("<header>h<nav>n</nav>h2</header>mid<footer>f</footer>")
      == "mid")
    assert(x("<head><title>t</title></head><body>b</body>") == "b")
    assert(x("<aside>a<aside>inner</aside>b</aside>c") == "c")
  }

  test("scope choice: main beats article beats whole document") {
    val page = "<body>out1<article>art</article><main>m1</main>out2</body>"
    assert(x(page) == "m1")
    assert(x("<body>out<article>art</article></body>") == "art")
    assert(x("<body>just body</body>") == "just body")
    // blank main falls through to article; blank both -> whole doc
    assert(x("<main> \t </main><article>a</article>") == "a")
    assert(x("<main></main><article>  </article>rest") == "rest")
    // boilerplate inside main still drops
    assert(x("<main>x<nav>menu</nav>y</main>") == "x y")
  }

  test("block tags separate words; inline tags do not") {
    assert(x("<p>a</p><p>b</p>") == "a b")
    assert(x("x<span>y</span>z") == "xyz")
    assert(x("a<br/>b<br>c") == "a b c")
    assert(x("<b>bo</b><i>it</i>") == "boit")
  }

  test("quoted '>' and '<' inside attribute values do not end the tag") {
    assert(x("""<div data-x="a>b" class='c<d'>t</div>""") == "t")
    assert(x("""<a href="u?a=1&amp;b=2">link</a>""") == "link")
  }

  test("lone '<' and trailing '&' are literal text") {
    assert(x("1 < 2 and 2 > 1") == "1 < 2 and 2 > 1")
    assert(x("a & b") == "a & b")
    assert(x("end <") == "end <")
  }

  test("full-fixture parity: Scala scanner == html.parser expected, " +
      "all 5000 pages") {
    val rows = spark.read
      .parquet("/root/repo/fixtures/html/htmldocs.parquet")
      .select(col("doc_id"), col("html"), col("main_text"))
      .collect()
    assert(rows.length == 5000)
    val bad = rows.iterator.map { r =>
      (r.getLong(0), x(r.getString(1)), r.getString(2))
    }.filter { case (_, got, want) => got != want }.take(3).toSeq
    assert(bad.isEmpty, s"first mismatches: $bad")
  }

  test("expression path equals kernel path and stays codegen'd " +
      "(StaticInvoke, no UDF)") {
    import spark.implicits._
    val df = spark.read
      .parquet("/root/repo/fixtures/html/htmldocs.parquet")
      .limit(50)
      .select(col("doc_id"),
        GraftFunctions.htmlExtractMain(col("html")).as("t"),
        col("html"))
    val viaExpr = df.select("doc_id", "t").as[(Long, String)]
      .collect().toMap
    val viaKernel = df.select("doc_id", "html").as[(Long, String)]
      .collect().map { case (id, h) => id -> x(h) }.toMap
    assert(viaExpr == viaKernel)
    // "*(n)" marks a whole-stage-codegen span in the tree string; the
    // static_invoke must sit inside one, with no UDF eval node anywhere
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("static_invoke")), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan)
  }
}
