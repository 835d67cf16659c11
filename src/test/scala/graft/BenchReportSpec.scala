package graft

/** Gates for the bench failure ledger (r13 verdict ask #1): the
  * TailStream tee, first-wins error dedup, and — the load-bearing one —
  * listener attribution by JOB GROUP so an asynchronously-delivered
  * task/job failure files under the query that submitted it, not
  * whatever a mutable global happens to hold when the event lands.
  */
class BenchReportSpec extends SparkSpec {

  test("TailStream passes every byte through and keeps a bounded tail") {
    val bos = new java.io.ByteArrayOutputStream
    val ts = new TailStream(bos, 16)
    val ps = new java.io.PrintStream(ts, true, "UTF-8")
    ps.print("0123456789")
    assert(ts.tail == "0123456789")
    ps.print("abcdefghijklmnopqrstuvwxyz")
    assert(bos.toString("UTF-8") == "0123456789abcdefghijklmnopqrstuvwxyz")
    val t = ts.tail
    assert(t.length <= 16 && t.endsWith("uvwxyz"), t)
  }

  test("TailStream suppresses whitelisted warning lines into a counted ledger, bytes still pass through") {
    val bos = new java.io.ByteArrayOutputStream
    val ts = new TailStream(bos, 4000)
    val ps = new java.io.PrintStream(ts, true, "UTF-8")
    ps.println("26/08/16 WARN WindowExec: No Partition Defined for Window operation! " +
      "Moving all data to a single partition.")
    ps.println("java.lang.RuntimeException: the stack that matters")
    ps.println("26/08/16 WARN WindowExec: No Partition Defined for Window operation! " +
      "Moving all data to a single partition.")
    val t = ts.tail
    // the real stderr saw everything
    assert(bos.toString("UTF-8").contains("No Partition Defined"), "passthrough")
    // the published tail: no whitelisted noise, a counted ledger, and
    // the real stack intact
    assert(!t.linesIterator.exists(l =>
      l.contains("No Partition Defined") && !l.startsWith("[stderr_tail]")), t)
    assert(t.contains("suppressed 2 whitelisted line(s)"), t)
    assert(t.contains("RuntimeException: the stack that matters"), t)
  }

  test("lazy phase markers bracket logged output and vanish for silent phases") {
    val bos = new java.io.ByteArrayOutputStream
    val ts = new TailStream(bos, 4000)
    val ps = new java.io.PrintStream(ts, true, "UTF-8")
    // silent phase: neither marker may appear (hundreds of begin/end
    // lines would evict the one stack that matters from the tail)
    ts.mark("[bench] begin q_silent")
    ts.endMark("[bench] end q_silent")
    assert(ts.tail.isEmpty && bos.size() == 0, ts.tail)
    // a phase that logs an (absorbed, analysis-time — no job, so no
    // job-group attribution) stack: the stack must land BETWEEN its
    // own named markers, attributable from the file twin alone
    ts.mark("[bench] begin q_noisy")
    ps.println("java.lang.RuntimeException: boom")
    ps.println("  at org.apache.spark.sql.catalyst.analysis.Analyzer")
    ts.endMark("[bench] end q_noisy")
    ts.mark("[bench] begin q_after_silent")
    ts.endMark("[bench] end q_after_silent")
    val t = ts.tail
    val begin = t.indexOf("[bench] begin q_noisy")
    val stack = t.indexOf("RuntimeException: boom")
    val end = t.indexOf("[bench] end q_noisy")
    assert(begin >= 0 && stack > begin && end > stack, t)
    assert(!t.contains("q_silent") && !t.contains("q_after_silent"), t)
    // passthrough holds: the wrapped stream saw the same bracketed text
    assert(bos.toString("UTF-8") == t, bos.toString("UTF-8"))
  }

  test("recordLine keeps the first error and counts repeats") {
    val be = new BenchErrors
    be.recordLine("q", "a"); be.recordLine("q", "b"); be.recordLine("q", "c")
    assert(be.errors("q") == "a (+2 more)")
    be.recordError("q2", new IllegalStateException("line1\nline2"))
    assert(be.errors("q2") == "IllegalStateException: line1")
  }

  test("listener attributes task and job failures by job group") {
    val be = new BenchErrors
    // if attribution leaked through the volatile global instead of the
    // job-group mapping, the failure would file under this name
    be.currentQuery = "_wrong"
    spark.sparkContext.addSparkListener(be.listener)
    try {
      spark.sparkContext.setJobGroup("q_boom", "q_boom",
        interruptOnCancel = false)
      intercept[Exception] {
        spark.sparkContext.parallelize(0 until 8, 2).map { i =>
          if (i == 5) throw new IllegalStateException("boom-task") else i
        }.count()
      }
      spark.sparkContext.clearJobGroup()
      // the listener bus is asynchronous — poll for delivery
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!be.errors.contains("q_boom") && System.nanoTime() < deadline)
        Thread.sleep(50)
      val e = be.errors.get("q_boom")
      assert(e.isDefined, s"errors=${be.errors}")
      // the task event (tagged by reason class) normally wins the slot;
      // a JobFailed-first delivery is equally adjudicable
      assert(e.get.startsWith("task:ExceptionFailure") ||
        e.get.startsWith("job:"), e.get)
      assert(e.get.contains("boom-task"), e.get)
      assert(!be.errors.contains("_wrong"), s"errors=${be.errors}")
    } finally spark.sparkContext.removeSparkListener(be.listener)
  }
}
