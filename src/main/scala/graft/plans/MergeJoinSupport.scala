package graft.plans

/** Shared per-partition helpers for the two custom merge execs
  * ([[AsOfJoinExec]], [[IntervalJoinExec]]) — one place to maintain the
  * key comparator and the buffer-aliasing copy rule. */
private[plans] object MergeJoinSupport {

  /** Total order over evaluated join keys. Callers filter nulls before
    * comparing (null never equi-matches); the null arms remain only for
    * sort-order consistency with nulls-first input. */
  def ordCompare(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: org.apache.spark.unsafe.types.UTF8String, y: org.apache.spark.unsafe.types.UTF8String) =>
      x.compareTo(y)
    case (x: Comparable[Any] @unchecked, y) => x.compareTo(y)
  }

  /** eval() results can alias a reused buffer (sort-spill readers recycle
    * one byte[] per record) — anything cached across rows must be copied
    * or key-change detection silently fails at spill scale. */
  def own(k: Any): Any = k match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
    case other => other
  }
}
