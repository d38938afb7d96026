package graft.operators

/** Driver/task-local vector kernels shared by the ANN operators.
  *
  * [[cosine]] is the SAME sequential fold as the codegen
  * [[graft.functions.CosineSimilarity]] expression — bit-exact with
  * in-plan scoring (a zero-norm vector yields NaN exactly like the
  * expression), which is what lets [[IvfStore]] rank probe centroids
  * on the driver while staying row-identical to the declarative
  * [[AnnSearch.ivf]]. [[cosineOrZero]] is the graph-walk variant
  * [[NswSearch]] uses, where a zero-norm node must compare as
  * "no similarity" (0.0) rather than poison the frontier ordering
  * with NaN.
  */
private[operators] object VecMath {
  private def fold(a: Array[Double], b: Array[Double]): (Double, Double) = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    (dot, math.sqrt(na) * math.sqrt(nb))
  }

  def cosine(a: Array[Double], b: Array[Double]): Double = {
    val (dot, d) = fold(a, b)
    dot / d
  }

  def cosineOrZero(a: Array[Double], b: Array[Double]): Double = {
    val (dot, d) = fold(a, b)
    if (d == 0.0) 0.0 else dot / d
  }
}
