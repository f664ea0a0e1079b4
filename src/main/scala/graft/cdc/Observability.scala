package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Observability parity with the reference's two remaining settings-level
  * behaviors:
  *
  *  - `debug` (`settings.py:64`, `main.py:35-36,103-104`): the reference
  *    logs its parsed settings at startup and every decoded event as it
  *    streams. [[DebugLog]] is the Spark analog — log4j lines plus a
  *    bounded in-memory ring so tests (and an operator's REPL) can read
  *    the recent entries without scraping logs. Per-event logging is
  *    bounded per micro-batch: a 1000-executor batch can carry millions
  *    of events, and debug output that scales with data volume is an
  *    outage, not a diagnostic.
  *  - Sentry error reporting (`main.py:37-44`, `settings.py:59-61`): the
  *    reference initializes sentry_sdk from config and lets it capture
  *    crashes. [[GraftErrorReporter]] is the pluggable analog — config
  *    lists reporter classes, [[ErrorReporting.attach]] wires them to a
  *    [[StreamingQueryListener]] that fires on query death with the error,
  *    and the CLI routes batch-command failures through the same hook.
  */
object DebugLog {
  private val log = org.slf4j.LoggerFactory.getLogger("graft.debug")
  private val ring = new java.util.concurrent.ConcurrentLinkedDeque[String]()
  private val Cap = 256

  /** Record a debug line: log4j (operational surface) + the bounded ring
    * (inspectable surface). The message thunk only evaluates here, so
    * callers guard with their debug flag and pay nothing when off. */
  def record(msg: => String): Unit = {
    val m = msg
    log.info(m)
    ring.addLast(m)
    while (ring.size > Cap) ring.pollFirst()
  }

  /** Recent entries, oldest first (bounded at the cap). */
  def recent(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    ring.iterator().asScala.toSeq
  }

  def clear(): Unit = ring.clear()
}

/** Pluggable error-reporter contract (the sentry-analog surface): implement
  * with a no-arg constructor, list the class under `error.listeners=` in
  * the CLI config; `init` receives every `error.*` config entry (the
  * dsn/environment analog). `report` fires with a context string and the
  * error description. */
trait GraftErrorReporter {
  def init(conf: Map[String, String]): Unit = ()
  def report(context: String, error: String): Unit
}

object ErrorReporting {

  /** Reflection loader — same dotted-path contract as
    * [[PluginHooks.load]]. */
  def load(classNames: Seq[String],
           conf: Map[String, String] = Map.empty): Seq[GraftErrorReporter] =
    classNames.map(_.trim).filter(_.nonEmpty).map { n =>
      val r =
        try Class.forName(n).getDeclaredConstructor().newInstance()
          .asInstanceOf[GraftErrorReporter]
        catch { case e: Exception =>
          throw new IllegalArgumentException(
            s"cannot load error reporter class '$n' " +
              "(config key error.listeners=)", e)
        }
      r.init(conf)
      r
    }

  /** Attach a listener that forwards THIS query's death-with-error to the
    * reporters (a clean stop reports nothing). Returns the listener so
    * callers can detach it early; on the query's termination it detaches
    * ITSELF (the [[ProgressPublisher]] discipline) — a checkpointed query
    * restarted in one session keeps the same id, so a stale listener from
    * a prior run would double-report every later death (r9 review). */
  def attach(spark: SparkSession, queryId: java.util.UUID,
             reporters: Seq[GraftErrorReporter]): StreamingQueryListener = {
    val l = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == queryId) {
          e.exception.foreach(err =>
            reporters.foreach(_.report(s"stream ${e.id}", err)))
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(l)
    l
  }

  /** Route a batch-command failure (refresh/check — no streaming query to
    * listen on) through the same reporters, then rethrow. */
  def reporting[T](reporters: Seq[GraftErrorReporter], context: String)
                  (body: => T): T =
    try body
    catch {
      case e: Throwable =>
        reporters.foreach(_.report(context, e.toString))
        throw e
    }
}
