package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ordered-pair expansion of an array column, built from higher-order
  * functions only (stays inside whole-stage codegen — no UDF):
  * sorts the array, then emits struct(_1, _2) for every i < j position
  * combination. The collect-per-key → orderedPairs → count shape is
  * this engine's standard replacement for fact-table self-joins in
  * co-occurrence/bucketing operators: one shuffle of the keyed rows
  * instead of a self-join that either broadcasts the full table or
  * shuffles it twice (SURVEY §2.3 J4 scale note).
  */
object ArrayPairs {
  /** array<T> → array<struct<_1:T,_2:T>> of sorted i<j pairs. Position
    * pairs, so duplicate values yield duplicate pairs (callers filter
    * `_1 < _2` when strictness matters). */
  def orderedPairs(arr: Column): Column = {
    val sorted = array_sort(arr)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + lit(2), size(sorted)), y =>
        struct(x.as("_1"), y.as("_2")))))
  }
}
