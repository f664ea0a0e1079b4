package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Pluggable EXTERNAL progress store — the reference's `Progress` backends
  * (`progress/file.py`, `progress/redis.py:19-23`: a string hash the sync
  * loop rewrites after every applied batch so OTHER applications can read
  * where the sync is). Spark's checkpoint remains the source of truth for
  * restart; this store is the cross-application visibility channel the
  * checkpoint directory cannot provide (it is private to the query).
  *
  * `set` MERGES fields into the stored hash (redis `HMSET` semantics) in
  * both backends; the reference's file backend REPLACES the whole map on
  * every set, which silently drops sibling keys when two writers share one
  * store — an asymmetry vs its own redis backend that we deliberately do
  * not reproduce (same posture as the rows[0] and wal2json-truncation
  * bugs, SURVEY.md §2.3). */
trait ProgressStore {
  def set(fields: Map[String, String]): Unit
  def get(): Map[String, String]
}

/** File-backed store (`progress/file.py`): one JSON object of string
  * fields. Writes are read-merge-write under an OS file lock (the class's
  * stated purpose is one store shared ACROSS applications, so in-process
  * `synchronized` alone would let two JVMs' merges lose each other's
  * fields — r9 review) through a per-process temp file + atomic rename, so
  * a concurrent reader never sees a torn object and a concurrent writer
  * can never rename this writer's half-written temp live. Readers stay
  * lock-free: the atomic rename guarantees they always see a complete
  * object (possibly one merge old — the same freshness contract a redis
  * HMSET reader has). */
final class FileProgressStore(path: String) extends ProgressStore {
  private val p = java.nio.file.Paths.get(path)
  // one shared mapper (review r11): construction is Jackson's most
  // expensive operation and set() ran one per field per micro-batch;
  // ObjectMapper is thread-safe for reuse
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // in-JVM exclusion must be PATH-keyed (not per-instance) and must wrap
  // the OS lock: the JVM throws OverlappingFileLockException instead of
  // blocking when two of its own threads contend for one file lock
  def set(fields: Map[String, String]): Unit =
    FileProgressStore.jvmLock(path).synchronized {
      val lockCh = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(path + ".lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = lockCh.lock() // cross-process exclusive
        try {
          val merged = get() ++ fields
          val node = mapper.createObjectNode()
          merged.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
          val json = mapper.writeValueAsString(node)
          val tmp = java.nio.file.Paths.get(
            path + ".tmp-" + ProcessHandle.current().pid())
          java.nio.file.Files.write(tmp,
            json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          java.nio.file.Files.move(tmp, p,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        } finally lock.release()
      } finally lockCh.close()
    }

  def get(): Map[String, String] =
    if (!java.nio.file.Files.exists(p)) Map.empty
    else {
      val node = mapper.readTree(java.nio.file.Files.readAllBytes(p))
      val it = node.fields()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
      b.result()
    }
}

object FileProgressStore {
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def jvmLock(path: String): Object =
    jvmLocks.computeIfAbsent(path, _ => new Object)
}

/** Socket-backed store — the redis analog over the same two-verb wire
  * discipline as the CDC socket transport: `HSET k v [k v ...]` merges
  * fields, `HGETALL` returns `k\tv` lines. Values are URL-encoded on the
  * wire so fields may contain whitespace/newlines (offset JSON does). */
final class SocketProgressStore(hostPort: String,
                                retry: graft.sources.Retry =
                                  graft.sources.Retry(3, 200L))
    extends ProgressStore {
  private val Array(host, port) = hostPort.split(':')

  // THE wire plumbing is SocketCdc's (review r11: this class carried a
  // line-for-line copy of roundTrip that silently lacked the reconnect
  // hardening) — each attempt a fresh connection, retried with doubling
  // backoff, then failed loud
  private def roundTrip[A](request: String)(read: java.io.BufferedReader => A): A =
    graft.sources.SocketCdc.withReconnect(s"$request @ $hostPort", retry)(
      graft.sources.SocketCdc.roundTrip(host, port.toInt, request)(read))

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  def set(fields: Map[String, String]): Unit =
    if (fields.nonEmpty) {
      val kv = fields.toSeq.flatMap { case (k, v) => Seq(enc(k), enc(v)) }
      val ack = roundTrip(s"HSET ${kv.mkString(" ")}")(_.readLine())
      // fail loud, not silent: a swallowed ERR here would look like a
      // stalled sync to every downstream reader of the store
      if (ack != "OK")
        throw new IllegalStateException(s"progress HSET rejected: $ack")
    }

  def get(): Map[String, String] =
    roundTrip("HGETALL") { in =>
      val b = Map.newBuilder[String, String]
      var line = in.readLine()
      while (line != null) {
        // split at the FIRST tab only — an empty value yields "k\t" whose
        // split-array has one element, and values themselves never contain
        // raw tabs (URL-encoded on the wire)
        val i = line.indexOf('\t')
        // a tab-less line is a protocol error (an ERR reply, or the addr
        // pointing at a different server entirely) — name it instead of a
        // bare StringIndexOutOfBounds (r9 review)
        if (i < 0) throw new IllegalStateException(
          s"progress HGETALL: unexpected reply '$line' from $hostPort — " +
            "not a progress KV server?")
        b += dec(line.substring(0, i)) -> dec(line.substring(i + 1))
        line = in.readLine()
      }
      b.result()
    }
}

/** The redis stand-in: an in-memory string hash served over TCP with the
  * two verbs [[SocketProgressStore]] speaks. Sandbox-deterministic like
  * [[graft.sources.CdcFeedServer]]. */
final class ProgressKvServer {
  private val hash = scala.collection.mutable.Map.empty[String, String]
  private val server = new java.net.ServerSocket(0)
  @volatile private var running = true

  def port: Int = server.getLocalPort
  def snapshot: Map[String, String] = hash.synchronized(hash.toMap)

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        try {
          // liveness: same silent-client guard as CdcFeedServer — readLine
          // with no timeout would park the accept loop forever (r9 review)
          sock.setSoTimeout(10000)
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
          val out = new java.io.PrintWriter(sock.getOutputStream, true)
          val req = in.readLine()
          if (req != null) {
            // limit -1 keeps trailing empty fields: an empty (URL-encoded
            // zero-length) value in last position must not be trim/split
            // away, or the preceding key is silently dropped
            val parts = req.split(" ", -1)
            parts(0) match {
              case "HSET" =>
                hash.synchronized {
                  parts.drop(1).grouped(2).foreach {
                    case Array(k, v) => hash(k) = v
                    case _ => // trailing key with no value: ignore
                  }
                }
                out.println("OK")
              case "HGETALL" =>
                hash.synchronized(hash.toSeq).sortBy(_._1)
                  .foreach { case (k, v) => out.println(s"$k\t$v") }
              case other => out.println(s"ERR unknown verb: $other")
            }
          }
        } finally sock.close()
      } catch {
        case _: java.net.SocketException =>
        case scala.util.control.NonFatal(_) =>
      }
    }
  }, s"progress-kv-server-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }
}

/** Publishes a streaming query's COMMITTED progress to a [[ProgressStore]]
  * — the reference's write-progress-after-each-batch loop
  * (`main.py:84-101`), expressed as a `StreamingQueryListener` so only
  * batches the checkpoint has committed are ever visible externally (a
  * foreachBatch-side write would publish positions a crash then rewinds).
  * Fields mirror the reference's hash: the batch id, the source's end
  * offset (the replication position), and the trigger timestamp. */
object ProgressPublisher {

  /** The attached listener, with its failure state readable: Spark's
    * listener bus catches and merely logs every throwable a listener
    * raises, so a store.set failure can never fail anything by throwing
    * (review r11 — the 'fail loud' HSET rejection was being silently
    * swallowed here, producing exactly the frozen-external-position stall
    * the store exists to prevent). The publisher therefore (a) logs each
    * failure at ERROR with the position that could not be published, and
    * (b) keeps the latest failure in [[lastFailure]] — cleared by the next
    * successful publish — so a library caller holding the listener can
    * poll/alert on a persistently failing visibility channel. */
  final class Publisher(spark: SparkSession, queryId: java.util.UUID,
                        store: ProgressStore) extends StreamingQueryListener {
    @volatile var lastFailure: Option[String] = None

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      if (e.progress.id == queryId && e.progress.numInputRows > 0) {
        val fields = Map(
          "batchId" -> e.progress.batchId.toString,
          "endOffset" -> e.progress.sources.map(_.endOffset).mkString(","),
          "timestamp" -> e.progress.timestamp)
        try { store.set(fields); lastFailure = None }
        catch { case scala.util.control.NonFatal(t) =>
          val msg = s"progress publish failed at batch " +
            s"${e.progress.batchId} (external readers see a stale " +
            s"position until a later batch succeeds): $t"
          lastFailure = Some(msg)
          ProgressPublisher.log.error(msg)
        }
      }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      // self-detach so per-run listeners don't accumulate across the
      // restart cycles a checkpointed pipeline goes through in one session
      if (e.id == queryId) spark.streams.removeListener(this)
  }

  private val log =
    org.apache.logging.log4j.LogManager.getLogger("graft.ProgressPublisher")

  def attach(spark: SparkSession, queryId: java.util.UUID,
             store: ProgressStore): Publisher = {
    val l = new Publisher(spark, queryId, store)
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: StreamingQueryListener): Unit =
    spark.streams.removeListener(l)
}
