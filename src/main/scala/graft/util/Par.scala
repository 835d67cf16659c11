package graft.util

/** Run independent Spark ACTIONS concurrently from driver threads —
  * guide §2.6 ("overlap independent jobs"): a multi-phase operator
  * that writes two stores back-to-back leaves the cluster idle during
  * each job's tail and driver-side commit; submitting both from two
  * threads lets the second job's tasks back-fill. Results are
  * unaffected (the jobs are independent by contract — disjoint output
  * paths, no shared lineage mutation); Spark's scheduler interleaves
  * them FIFO. Child threads inherit the caller's job group / job
  * description (SparkContext local properties are inheritable), so
  * bench attribution and cancellation still see one query.
  *
  * Failure contract: waits for BOTH, then rethrows the first failure
  * (the second branch is never left running unsupervised).
  */
object Par {
  def run(a: => Unit, b: => Unit): Unit = {
    @volatile var ea: Throwable = null
    @volatile var eb: Throwable = null
    val ta = new Thread(() => try a catch { case t: Throwable => ea = t })
    val tb = new Thread(() => try b catch { case t: Throwable => eb = t })
    ta.setDaemon(true); tb.setDaemon(true)
    ta.start(); tb.start()
    ta.join(); tb.join()
    if (ea != null) throw ea
    if (eb != null) throw eb
  }
}
