package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** H5 — LLM call orchestration (reference eval/text_to_sql.py:48-224,
  * eval/get_manifest.py:6-33).
  *
  * The reference's orchestration is: construct a prompt per instruction
  * (its prompt_formatters), dispatch batches to a model server with
  * generation parameters (max_tokens/temperature/num_beams/stop
  * sequences — text_to_sql.py:118-127), restitch the completion
  * (format_model_output is the identity for every shipped formatter,
  * prompt_formatters.py:65-67), truncate at stop sequences
  * (text_to_sql.py:160-163) and account usage. Only the transport is a
  * network concern; EVERYTHING else is data flow, and runs here
  * in-engine. The transport is an injectable [[GenerationClient]]: a
  * real deployment supplies an HTTP client; the offline sandbox (and
  * the oracle-checked catalog entry q183) injects [[EchoClient]], a
  * deterministic pure function of (prompt, params) reproducible in
  * plain SQL — which makes the WHOLE orchestration loop value-checkable
  * without a network.
  *
  * Scale shape (100 TB of instructions): prompts are one codegen'd
  * concat per row (PromptOps); dispatch is a batched mapPartitions
  * kernel — the same vectorized-call shape as the media codecs — so a
  * real client amortizes connections per batch, bounds in-flight
  * requests to `batchSize` per task, and the job parallelizes over
  * whatever partitioning the instruction table has. No shuffle
  * anywhere; post-processing is codegen'd string algebra.
  */
object LlmOrchestrator {

  /** Generation parameters (text_to_sql.py:118-127 manifest_params). */
  final case class GenParams(maxTokens: Int = 300,
      temperature: Double = 0.0, numBeams: Int = 1,
      stopSequences: Seq[String] = Seq(";", "\n"))

  /** The transport seam: a batch of prompts in, raw completions out.
    * Runs inside tasks — implementations must be serializable. */
  trait GenerationClient extends Serializable {
    def generate(prompts: Seq[String], params: GenParams): Seq[String]
  }

  /** Deterministic offline transport: completes every prompt with a SQL
    * answer derived only from the prompt's length, followed by chatter
    * that the stop-sequence truncation must strip. Pure function of
    * (prompt, params) ⇒ the orchestration around it is oracle-checkable
    * offline (q183). */
  final class EchoClient extends GenerationClient {
    def generate(prompts: Seq[String], params: GenParams): Seq[String] =
      prompts.map(p => s"SELECT ${p.length} AS prompt_len;\n" +
        s"-- max_tokens=${params.maxTokens} beams=${params.numBeams}")
  }

  /** Chat transport seam (the reference's DuckDBChat path hands the
    * model a role/content message list instead of one string). */
  trait ChatGenerationClient extends Serializable {
    /** One completion per conversation; each conversation is a list of
      * (role, content) messages. */
    def generate(conversations: Seq[Seq[(String, String)]],
        params: GenParams): Seq[String]
  }

  /** Deterministic offline chat transport: finds the question between
    * the backticks the DuckDBChat template wraps it in (a property of
    * the template, so this stub needs NO engine internals) and answers
    * with SQL derived from the question text alone — reproducible in
    * plain SQL for the oracle. */
  final class EchoChatClient extends ChatGenerationClient {
    def generate(conversations: Seq[Seq[(String, String)]],
        params: GenParams): Seq[String] =
      conversations.map { msgs =>
        val last = msgs.last._2
        val q = last.substring(last.indexOf('`') + 1,
          last.indexOf('`', last.indexOf('`') + 1))
        s"SELECT ${q.length} AS q_len;\n-- chat beams=${params.numBeams}"
      }
  }

  /** The chat-style loop (text_to_sql.py's message-list branch):
    * DuckDBChat message construction, batched dispatch, stop-sequence
    * truncation. Output: (id, n_messages, sql, completion_chars). */
  def textToSqlChat(questions: DataFrame, idCol: String,
      questionCol: String,
      tables: Seq[(String, org.apache.spark.sql.types.StructType)],
      client: ChatGenerationClient, params: GenParams = GenParams(),
      batchSize: Int = 16): DataFrame = {
    val prompted = PromptOps.withChatPrompt(
        questions.select(col(idCol), col(questionCol)),
        questionCol, tables)
      .select(col(idCol), col("messages"))
    val outSchema = StructType(Seq(prompted.schema.fields.head,
      StructField("n_messages",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      StructField("raw_output", StringType, nullable = true)))
    val withRaw = prompted.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val convs = batch.map(_.getSeq[Row](1).map(m =>
          (m.getString(0), m.getString(1))))
        val outs = client.generate(convs, params)
        require(outs.length == batch.length,
          s"client returned ${outs.length} completions for ${batch.length} conversations")
        batch.iterator.zip(outs.iterator)
          .zip(convs.iterator).map { case ((r, raw), conv) =>
            Row(r.get(0), conv.length, raw)
          }
      }
    }(Encoders.row(outSchema))
    withRaw.select(
      col(idCol),
      col("n_messages").cast("long").as("n_messages"),
      PromptOps.truncateAtStops(col("raw_output"), params.stopSequences)
        .as("sql"),
      length(col("raw_output")).cast("long").as("completion_chars"))
  }

  /** The reference's instruction→SQL loop: format prompts, dispatch in
    * batches through `client`, truncate at the stop sequences, account
    * usage. Usage is counted in characters (the reference reports the
    * model server's token counts, which don't exist offline; character
    * counts are the deterministic analogue and keep the accounting
    * value-checked). Output: (id, sql, prompt_chars, completion_chars,
    * total_chars). */
  def textToSql(questions: DataFrame, idCol: String, questionCol: String,
      style: String,
      tables: Seq[(String, org.apache.spark.sql.types.StructType)],
      client: GenerationClient, params: GenParams = GenParams(),
      batchSize: Int = 16): DataFrame = {
    val prompted = PromptOps.withPrompt(
        questions.select(col(idCol), col(questionCol)),
        questionCol, style, tables)
      .select(col(idCol), col("prompt"))
    // batched dispatch — one client call per `batchSize` prompts per
    // partition; the id rides through Row-encoded (same pass-through
    // convention as the media kernels)
    val outSchema = StructType(prompted.schema.fields :+
      StructField("raw_output", StringType, nullable = true))
    val withRaw = prompted.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val outs = client.generate(batch.map(_.getString(1)), params)
        require(outs.length == batch.length,
          s"client returned ${outs.length} completions for ${batch.length} prompts")
        batch.iterator.zip(outs.iterator).map { case (r, raw) =>
          Row(r.get(0), r.getString(1), raw)
        }
      }
    }(Encoders.row(outSchema))
    withRaw.select(
      col(idCol),
      PromptOps.truncateAtStops(col("raw_output"), params.stopSequences)
        .as("sql"),
      length(col("prompt")).cast("long").as("prompt_chars"),
      length(col("raw_output")).cast("long").as("completion_chars"),
      (length(col("prompt")) + length(col("raw_output"))).cast("long")
        .as("total_chars"))
  }
}
