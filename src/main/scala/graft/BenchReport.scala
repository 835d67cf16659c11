package graft

import java.io.OutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.scheduler.{JobFailed, SparkListener,
  SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.TaskFailedReason

/** Bounded-tail tee for a process stream: every byte still reaches the
  * wrapped stream, and the LAST `cap` chars stay readable. Installed
  * over System.err before SparkSession creation so log4j's console
  * appender (resolved at appender start) writes through it — executor
  * task stacks, streaming-query aborts and writer retries all land in
  * the tail even when a stage retry absorbs them. The bench file twin
  * publishes it as `stderr_tail`, so a stack trace in the driver's
  * captured stderr is attributable from the artifact alone instead of
  * through the driver's 2000-char stdout window (the r12/r13 orphan
  * pipelineJsonlQ trace class).
  */
final class TailStream(underlying: OutputStream, cap: Int)
    extends OutputStream {
  private val buf = new java.lang.StringBuilder
  private val lineBuf = new java.lang.StringBuilder
  private val suppressedCounts =
    scala.collection.mutable.LinkedHashMap[String, Long]()
  private var pending: String = null
  private def keep(): Unit =
    if (buf.length > cap * 2) buf.delete(0, buf.length - cap)
  /** Line-aware tail append: completed lines matching a whitelisted
    * noise pattern (plan-audited partition-less WindowExec warnings —
    * PlanAuditSpec documents why those windows are correct) are
    * COUNTED instead of buffered, so 16-per-run known warnings cannot
    * evict the one absorbed stack the tail exists to catch. Every
    * byte still reaches the real stderr unfiltered; only the
    * published tail is curated, and [[tail]] leads with the
    * suppression ledger so nothing disappears silently. */
  private def appendTail(s: String): Unit = {
    lineBuf.append(s)
    var nl = lineBuf.indexOf("\n")
    while (nl >= 0) {
      val line = lineBuf.substring(0, nl + 1)
      lineBuf.delete(0, nl + 1)
      TailStream.whitelisted.find(p => line.contains(p)) match {
        case Some(p) =>
          suppressedCounts(p) = suppressedCounts.getOrElse(p, 0L) + 1L
        case None => buf.append(line); keep()
      }
      nl = lineBuf.indexOf("\n")
    }
    // bound a pathological never-terminated line
    if (lineBuf.length > cap) { buf.append(lineBuf); lineBuf.setLength(0); keep() }
  }
  private def emit(line: String): Unit = {
    val bs = (line + "\n").getBytes(StandardCharsets.UTF_8)
    underlying.write(bs, 0, bs.length)
    appendTail(line + "\n")
  }
  private def drainMark(): Unit =
    if (pending != null) { val m = pending; pending = null; emit(m) }
  override def write(b: Int): Unit = synchronized {
    drainMark(); underlying.write(b); appendTail(b.toChar.toString)
  }
  override def write(b: Array[Byte], off: Int, len: Int): Unit =
    synchronized {
      drainMark()
      underlying.write(b, off, len)
      appendTail(new String(b, off, len, StandardCharsets.UTF_8))
    }
  override def flush(): Unit = underlying.flush()
  def tail: String = synchronized {
    val ledger =
      if (suppressedCounts.isEmpty) ""
      else suppressedCounts.map { case (p, n) =>
        s"[stderr_tail] suppressed $n whitelisted line(s) matching: $p"
      }.mkString("", "\n", "\n")
    val s = buf.toString + lineBuf.toString
    ledger + (if (s.length > cap) s.substring(s.length - cap) else s)
  }

  /** LAZY phase marker: `label` is written (to the wrapped stream AND
    * the tail) only when — and immediately before — the next real byte
    * arrives, so a silent phase costs zero tail bytes (hundreds of
    * begin/end lines must not evict the one stack that matters) while
    * any logged output still opens with its owning phase's name.
    */
  def mark(label: String): Unit = synchronized { pending = label }

  /** Close the current phase: if [[mark]]'s label was never drained
    * (nothing logged), both markers vanish; otherwise the closing
    * label lands after the phase's output, bracketing it by name.
    */
  def endMark(label: String): Unit = synchronized {
    if (pending != null) pending = null else emit(label)
  }
}

/** Per-query failure ledger for the bench artifact. Two capture paths:
  *
  *  - `recordError` from `timed`'s own catch (the query's driver-side
  *    exception);
  *  - the Spark listener, which records EVERY failed task reason (not
  *    just ExceptionFailure — FetchFailed, TaskKilled, ExecutorLost,
  *    Resubmitted, commit-denied all tag by reason class) plus
  *    JobFailed job ends, so a failure absorbed by a stage retry still
  *    lands in the published errors map (the r13 escape class).
  *
  * Attribution is by JOB GROUP, not a mutable "current query" global:
  * the listener bus is asynchronous, so an event can arrive after the
  * main thread has moved on to the next query. `Bench.timed` sets the
  * query name as the job group; onJobStart pins jobId→owner and
  * stageId→owner from the submitting thread's properties, and task/job
  * ends look the owner up by stage/job id. The volatile fallback only
  * covers events with no recorded owner (setup/teardown work).
  */
object TailStream {
  /** Known-noise line patterns kept OUT of the published tail (counted
    * in the suppression ledger instead). Only plan-audited warnings
    * belong here: the partition-less WindowExec warning fires 16×
    * per q_bh_fdr run for the whitelisted battery-grain rank walk
    * (PlanAuditSpec documents why that window is correct) and was
    * burying real absorbed stacks. */
  val whitelisted: Seq[String] = Seq(
    "No Partition Defined for Window operation")
}

final class BenchErrors {
  val errors = scala.collection.mutable.LinkedHashMap[String, String]()
  @volatile var currentQuery: String = "_setup"
  private val stageOwner =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()
  private val jobOwner =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()

  /** First error line per query wins; later ones bump a "(+N more)"
    * suffix so repeats stay visible without flooding the artifact.
    */
  def recordLine(name: String, line: String): Unit = errors.synchronized {
    errors.get(name) match {
      case None => errors(name) = line
      case Some(prev) =>
        val n = "\\(\\+(\\d+) more\\)$".r.findFirstMatchIn(prev)
          .map(_.group(1).toInt).getOrElse(0)
        errors(name) = prev.replaceAll(" \\(\\+\\d+ more\\)$", "") +
          s" (+${n + 1} more)"
    }
  }

  def recordError(name: String, e: Throwable): Unit =
    recordLine(name,
      s"${e.getClass.getSimpleName}: ${firstLine(e.getMessage)}")

  private def firstLine(s: String, cap: Int = 160): String =
    Option(s).getOrElse("").linesIterator
      .find(_.nonEmpty).getOrElse("").take(cap)

  val listener: SparkListener = new SparkListener {
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val owner = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        .getOrElse(currentQuery)
      jobOwner.put(js.jobId, owner)
      js.stageIds.foreach(sid => stageOwner.put(sid, owner))
    }
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      te.reason match {
        case f: TaskFailedReason =>
          val owner = Option(stageOwner.get(te.stageId))
            .getOrElse(currentQuery)
          recordLine(owner,
            s"task:${f.getClass.getSimpleName.stripSuffix("$")}: " +
              firstLine(f.toErrorString))
        case _ =>
      }
    override def onJobEnd(je: SparkListenerJobEnd): Unit =
      je.jobResult match {
        case JobFailed(e) =>
          val owner = Option(jobOwner.get(je.jobId))
            .getOrElse(currentQuery)
          recordLine(owner,
            s"job:${e.getClass.getSimpleName}: ${firstLine(e.getMessage)}")
        case _ =>
      }
  }
}
