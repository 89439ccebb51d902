package graft.pipeline

/** The ONE definition of the primitive vector folds every grouped-cell
  * operator in this package runs inside `flatMapGroups` loops
  * ([[Clustering.semanticDedup]], [[Similarity.topPairPerGroup]], the
  * IVF probe-selection loop). Each is the same SEQUENTIAL index-order
  * fold as the native `vec_dot` expression
  * ([[graft.functions.VecDotExpr]]) and the DuckDB oracle's
  * `list_reduce` — sharing the body keeps the bit-parity argument in
  * one place: a reformulated loop (blocked, fused, reordered) would
  * change float results and break every oracle hash at once.
  */
private[pipeline] object VecOps {

  /** Sequential dot product — the `vec_dot` fold. */
  def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** |v|² via the same fold (`vec_dot(v, v)`). */
  def normSq(a: Array[Double]): Double = dot(a, a)

  /** |v| — the plan-side `sqrt(vec_dot(v, v))`. */
  def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
}
