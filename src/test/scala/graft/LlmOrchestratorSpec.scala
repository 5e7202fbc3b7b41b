package graft

import org.apache.spark.sql.functions._
import graft.operators.LlmOrchestrator
import graft.operators.LlmOrchestrator.{EchoClient, GenParams, GenerationClient}

/** H5 orchestration semantics: batching is invisible, stop truncation
  * follows the reference's split-in-order rule, and a misbehaving
  * transport fails loudly instead of misaligning ids. */
class LlmOrchestratorSpec extends SparkSpecBase {

  private lazy val questions = {
    Queries.prep(spark, sfDir)
    spark.table("documents").select(col("doc_id"), col("text")).limit(40)
  }
  private def tables =
    Seq(("region", spark.table("region").schema))

  test("batch size and partitioning are invisible to the result") {
    def run(df: org.apache.spark.sql.DataFrame, bs: Int) =
      LlmOrchestrator.textToSql(df, "doc_id", "text", "rajkumar",
          tables, new EchoClient(), batchSize = bs)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val base = run(questions, 16)
    assert(base.nonEmpty)
    assert(run(questions, 3) == base)
    assert(run(questions.repartition(7), 16) == base)
  }

  test("stop sequences truncate in order (reference split semantics)") {
    val client = new GenerationClient {
      def generate(prompts: Seq[String], params: GenParams): Seq[String] =
        prompts.map(_ => "SELECT 1\n-- tail; chatter")
    }
    // first stop ';' splits nothing before '\n' does: order matters
    val out = LlmOrchestrator.textToSql(questions.limit(1), "doc_id",
        "text", "rajkumar", tables, client,
        GenParams(stopSequences = Seq(";", "\n")))
      .select("sql").head.getString(0)
    assert(out == "SELECT 1", out)
  }

  test("a transport returning the wrong arity fails loudly") {
    val bad = new GenerationClient {
      def generate(prompts: Seq[String], params: GenParams): Seq[String] =
        prompts.drop(1).map(_ => "SELECT 1")
    }
    val e = intercept[org.apache.spark.SparkException] {
      LlmOrchestrator.textToSql(questions, "doc_id", "text", "rajkumar",
        tables, bad).collect()
    }
    assert(e.getMessage.contains("completions") ||
      e.getCause != null, e.getMessage)
  }

  test("usage accounting: total = prompt + completion, per row") {
    val rows = LlmOrchestrator.textToSql(questions, "doc_id", "text",
        "rajkumar", tables, new EchoClient()).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("total_chars") ==
        r.getAs[Long]("prompt_chars") + r.getAs[Long]("completion_chars"))
      assert(r.getAs[Long]("prompt_chars") > 0)
    }
  }

  test("chat path: message construction + dispatch invariant to " +
      "batching; echo derives from the question alone") {
    import LlmOrchestrator.EchoChatClient
    def run(df: org.apache.spark.sql.DataFrame, bs: Int) =
      LlmOrchestrator.textToSqlChat(df, "doc_id", "text", tables,
          new EchoChatClient(), batchSize = bs)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val base = run(questions, 16)
    assert(base.nonEmpty)
    assert(run(questions, 5) == base)
    assert(run(questions.repartition(3), 16) == base)
    // four messages per the DuckDBChat template; sql echoes the
    // question length
    val q0 = questions.orderBy("doc_id").head
    val r0 = base.head
    assert(r0(1) == 4L)
    assert(r0(2) == s"SELECT ${q0.getString(1).length} AS q_len")
  }
}
