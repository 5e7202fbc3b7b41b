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

  // --- real HTTP transport, exercised against a JDK loopback server ---

  private def withServer(paths: (String,
      com.sun.net.httpserver.HttpHandler)*)(body: Int => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    paths.foreach { case (p, h) => server.createContext(p, h) }
    server.start()
    try body(server.getAddress.getPort) finally server.stop(0)
  }

  private def jsonHandler(
      f: com.fasterxml.jackson.databind.JsonNode =>
        com.fasterxml.jackson.databind.JsonNode)
      : com.sun.net.httpserver.HttpHandler = { ex =>
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val bytes = mapper.writeValueAsBytes(
      f(mapper.readTree(ex.getRequestBody)))
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("HTTP transport round-trips batches through a loopback server " +
      "and matches the EchoClient result") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val calls = new java.util.concurrent.atomic.AtomicInteger
    val handler = jsonHandler { req =>
      calls.incrementAndGet()
      // loopback model speaking the EchoClient function, so the whole
      // HTTP round trip is checkable against the in-process transport
      val prompts = req.get("prompts")
      val resp = mapper.createObjectNode()
      val comps = resp.putArray("completions")
      (0 until prompts.size()).foreach { i =>
        comps.add(s"SELECT ${prompts.get(i).asText().length} " +
          s"AS prompt_len;\n-- max_tokens=${req.get("max_tokens").asInt()} " +
          s"beams=${req.get("num_beams").asInt()}")
      }
      resp
    }
    withServer("/generate" -> handler) { port =>
      val http = new LlmOrchestrator.HttpGenerationClient(
        s"http://127.0.0.1:$port/generate")
      val got = LlmOrchestrator.textToSql(questions, "doc_id", "text",
          "rajkumar", tables, http, batchSize = 8)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val echo = LlmOrchestrator.textToSql(questions, "doc_id", "text",
          "rajkumar", tables, new EchoClient(), batchSize = 8)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(got == echo)
      // dispatch is batched: 40 questions at batchSize 8 must not cost
      // anywhere near 40 requests
      assert(calls.get() < questions.count(), s"calls=${calls.get()}")
    }
  }

  test("HTTP chat transport posts conversations and matches " +
      "EchoChatClient") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val handler = jsonHandler { req =>
      val convs = req.get("conversations")
      val resp = mapper.createObjectNode()
      val comps = resp.putArray("completions")
      (0 until convs.size()).foreach { i =>
        val conv = convs.get(i)
        val last = conv.get(conv.size() - 1).get("content").asText()
        val open = last.indexOf('`')
        val q = last.substring(open + 1, last.indexOf('`', open + 1))
        comps.add(s"SELECT ${q.length} AS q_len;\n-- chat " +
          s"beams=${req.get("num_beams").asInt()}")
      }
      resp
    }
    withServer("/chat" -> handler) { port =>
      val http = new LlmOrchestrator.HttpChatGenerationClient(
        s"http://127.0.0.1:$port/chat")
      val got = LlmOrchestrator.textToSqlChat(questions, "doc_id",
          "text", tables, http)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      val echo = LlmOrchestrator.textToSqlChat(questions, "doc_id",
          "text", tables, new LlmOrchestrator.EchoChatClient())
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      assert(got == echo)
    }
  }

  test("clientFromConf: Echo offline by default, HTTP only when the " +
      "endpoint conf is set") {
    assert(LlmOrchestrator.clientFromConf(spark).isInstanceOf[EchoClient])
    assert(LlmOrchestrator.chatClientFromConf(spark)
      .isInstanceOf[LlmOrchestrator.EchoChatClient])
    spark.conf.set("spark.graft.llm.endpoint", "http://127.0.0.1:9/x")
    spark.conf.set("spark.graft.llm.chat_endpoint", "http://127.0.0.1:9/y")
    try {
      assert(LlmOrchestrator.clientFromConf(spark)
        .isInstanceOf[LlmOrchestrator.HttpGenerationClient])
      assert(LlmOrchestrator.chatClientFromConf(spark)
        .isInstanceOf[LlmOrchestrator.HttpChatGenerationClient])
    } finally {
      spark.conf.unset("spark.graft.llm.endpoint")
      spark.conf.unset("spark.graft.llm.chat_endpoint")
    }
  }

  test("completePrompts passes every non-prompt column through and is " +
    "batch-size invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 37).map(i => (i.toLong, s"extra$i", s"prompt body $i"))
      .toDF("id", "extra", "prompt")
    def run(bs: Int) = LlmOrchestrator.completePrompts(df, "prompt",
        new LlmOrchestrator.EchoClient, batchSize = bs)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    val a = run(16)
    assert(a.length == 37)
    // echo completion embeds the prompt length — per-row alignment holds
    assert(a.forall { case (i, extra, raw) =>
      extra == s"extra$i" && raw.startsWith(
        s"SELECT ${s"prompt body $i".length} AS prompt_len;") })
    assert(run(5).toSeq == a.toSeq) // batching is invisible to results
  }

  test("promptOverflowStats: tokenizer-true counts per budget, " +
      "hand-checkable, one row per budget") {
    import spark.implicits._
    import graft.operators.TextOps
    // no merges: every char is a token; trailing newline must NOT
    // count as a token (the edge-word artifact BpeTokenizer drops)
    val tok = new TextOps.BpeTokenizer(Nil)
    val prompts = Seq("ab cd", "abcdef gh ij\n", "a")
      .toDF("prompt") // 4, 10, 1 tokens
    val got = LlmOrchestrator.promptOverflowStats(prompts, "prompt", tok,
      budgets = Seq(4, 2048)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      (4L, 3L, 15L, 10L, 1L, 0.333333),   // only the 10-token prompt > 4
      (2048L, 3L, 15L, 10L, 0L, 0.0)))
    // a trained merge shrinks counts: merge (a,b) on "ab" -> 1 token
    val tok2 = new TextOps.BpeTokenizer(Seq(("a", "b")))
    val one = LlmOrchestrator.promptOverflowStats(
      Seq("ab ab").toDF("prompt"), "prompt", tok2, budgets = Seq(2048))
      .collect().head
    assert(one.getLong(2) == 2L) // 2 merged tokens, was 4 chars
  }

  test("q217 rerank: a permutation of the BM25 top-10 with dense ranks") {
    import org.apache.spark.sql.functions._
    Queries.prep(spark, sfDir)
    val rr = SparkEntry.queries("q217_llm_rerank")(spark, sfDir).collect()
    assert(rr.length == 10)
    assert(rr.map(_.getInt(3)).toSeq == (1 to 10))
    val bm25 = graft.operators.RetrievalOps.bm25TopN(
      spark.table("documents"), "doc_id", "text",
      Seq("hash", "join", "merge", "filter"), n = 10)
      .collect().map(_.getLong(0)).toSet
    assert(rr.map(_.getLong(0)).toSet == bm25)
  }
}
