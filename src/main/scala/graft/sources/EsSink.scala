package graft.sources

import org.apache.spark.sql.DataFrame

/** Elasticsearch bulk sink (SURVEY §2.1 S4).
  *
  * The reference collects the WHOLE DataFrame to the driver
  * (`data.toPandas()`, sparktoELKstream.py:34) and bulk-posts from
  * Python — a driver OOM at any real scale. Here each partition
  * serializes its own rows to ES bulk NDJSON and posts directly from
  * the executor, so throughput scales with the cluster and the driver
  * never materializes data.
  *
  * Semantics kept from the reference: ALL columns are sent
  * (`use_these_keys = data.columns`, sparktoELKstream.py:50) and ES
  * assigns document ids. The HTTP transport is pluggable so tests (and
  * this offline container) can capture payloads instead of POSTing.
  */
object EsSink {

  type Transport = (String, String) => Unit // (url, ndjsonPayload)

  /** Typed HTTP failure so the retry wrapper can tell transient bulk
    * rejections from permanent errors by status code. */
  final case class EsHttpError(code: Int)
    extends java.io.IOException(s"ES bulk failed: HTTP $code")

  /** Default transport: HTTP POST via java.net (zero dependencies). */
  def httpTransport: Transport = (url, payload) => {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/x-ndjson")
    conn.setDoOutput(true)
    val out = conn.getOutputStream
    try out.write(payload.getBytes("UTF-8")) finally out.close()
    val code = conn.getResponseCode
    if (code >= 300) throw EsHttpError(code)
    conn.getInputStream.close()
  }

  /** Only transient failures earn a retry: bulk-queue pressure
    * (429) / gateway blips (502-504) / connection-level I/O errors.
    * Permanent rejections (400 mapping/parse, 401/403 auth) surface
    * immediately — retrying them just delays the real error. */
  private[sources] def isTransient(e: Exception): Boolean = e match {
    case EsHttpError(code) => code == 429 || (code >= 502 && code <= 504)
    case _: java.net.ConnectException => true
    case _: java.net.SocketTimeoutException => true
    case _: java.net.SocketException => true
    case _: java.net.UnknownHostException => true // transient DNS under failover
    case _ => false
  }

  /** Build bulk NDJSON actions for a partition's rows, chunked at
    * ~`maxBytes` per request (reference producer caps messages at
    * 900,000 bytes, electricraw.py:179 — same discipline here). */
  def bulkChunks(docs: Iterator[String], index: String,
      maxBytes: Int = 900000): Iterator[String] = {
    val action = s"""{"index":{"_index":"$index"}}""" + "\n"
    new Iterator[String] {
      def hasNext: Boolean = docs.hasNext
      def next(): String = {
        val sb = new StringBuilder
        while (docs.hasNext && sb.length < maxBytes)
          sb.append(action).append(docs.next()).append('\n')
        sb.toString
      }
    }
  }

  /** Wrap a transport with bounded exponential-backoff retry —
    * transient bulk rejections (429 queue-full, 503) are routine under
    * indexing pressure; a chunk that still fails after `attempts`
    * surfaces the last error (the task retry then re-runs the
    * partition, which is safe: ES auto-ids make re-posts duplicates,
    * not corruption — same at-least-once contract as the reference). */
  def retrying(transport: Transport, attempts: Int = 3,
      baseDelayMs: Long = 200L): Transport = (url, payload) => {
    var attempt = 0
    var done = false
    while (!done) {
      try { transport(url, payload); done = true }
      catch {
        // a task interrupt (speculative kill, cancellation) must
        // propagate, never be swallowed into a retry
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case e: Exception if isTransient(e) && attempt < attempts - 1 =>
          try Thread.sleep(baseDelayMs * (1L << attempt))
          catch { case ie: InterruptedException =>
            Thread.currentThread().interrupt(); throw ie }
          attempt += 1
        case e: Exception => throw e
      }
    }
  }

  /** Batch write: every executor partition posts its own bulk chunks
    * (with bounded-backoff retry per chunk).
    *
    * FAILURE CONTRACT (pinned by the failure-injection specs in
    * UtilitySpec): a chunk that fails permanently (4xx) or exhausts
    * the retry budget FAILS ITS TASK LOUDLY — chunks that partition
    * already posted are NOT rolled back (ES bulk has no transaction).
    * Spark's task retry then re-posts the WHOLE partition; with ES
    * auto-assigned ids the re-posts are duplicate documents, never
    * corruption — the same at-least-once contract as the reference's
    * driver-side bulk loop. Exactly-once requires caller-controlled
    * deterministic `_id`s, which the reference's schema (and so this
    * sink) does not use. */
  def write(df: DataFrame, index: String,
      nodes: String = "http://localhost:9200",
      transport: Transport = httpTransport,
      maxBytes: Int = 900000,
      retryAttempts: Int = 3): Unit = {
    val url = s"$nodes/_bulk"
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      val post = retrying(transport, retryAttempts)
      bulkChunks(it, index, maxBytes).foreach(p => post(url, p))
    }
  }

  /** Streaming form: `writeStream.foreachBatch(EsSink.foreachBatch(...))`. */
  def foreachBatch(index: String, nodes: String = "http://localhost:9200",
      transport: Transport = httpTransport): (DataFrame, Long) => Unit =
    (batch, _) => write(batch, index, nodes, transport)
}
