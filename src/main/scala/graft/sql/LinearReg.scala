package graft.sql

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types._

/** Closed-form linear regression — the engine behind
  * `CREATE MODEL model_type='linear_reg'` (BigQuery's third big-three
  * BQML class, next to kmeans and logistic_reg; reference anchor: the
  * dags' daily AVG-rate report is one regression-on-time away,
  * dags/fx_rates_dag.py report task).
  *
  * The whole training is ONE aggregate pass: the normal equations need
  * only the Gram sums Σxᵢxⱼ / Σxᵢy / Σy² over the (intercept-augmented)
  * feature vector — p ≤ 16 features means ≤ ~170 scalar aggregates,
  * map-side combined, a bounded driver fold. No iteration, no
  * gradient schedule; `optimize_strategy='batch_gradient_descent'` is
  * loud at the statement layer.
  *
  * DETERMINISM CONTRACT (what makes the faces hash-gateable): every
  * Gram sum is computed in EXACT DECIMAL arithmetic — each feature and
  * the label must be integral or decimal-typed (doubles are LOUD: a
  * double column has no true decimal width; cast it in the AS SELECT,
  * the repo-wide float-parity discipline), so the sums are
  * order-invariant exact values. Those exact sums convert to doubles
  * ONCE (correctly-rounded, engine-independent) and every downstream
  * double expression is a FIXED textual fold (stated below per method)
  * that an independent engine replays bit-for-bit from its own exact
  * sums. For p = 1 the solve is the closed form
  *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
  *   intercept = (Σy − slope·Σx) / n
  * (each sum already double, left-to-right association as written);
  * p ≥ 2 solves by Gaussian elimination with partial pivoting —
  * deterministic for fixed sums, spec-verified rather than
  * cross-engine-hashed.
  */
object LinearReg {

  /** The exact-decimal cast for one input column: decimals keep their
    * scale (precision must fit 18 so pairwise products stay inside
    * DECIMAL(38,_) exactly); integrals are scale-0; doubles/floats are
    * loud — no true decimal width to preserve.
    */
  private[graft] def exactCast(name: String, dt: DataType): Column = dt match {
    case d: DecimalType =>
      require(d.precision <= 18,
        s"linear_reg column '$name' is ${d.sql} — precision above 18 would make " +
          "pairwise Gram products inexact; reduce the precision in the AS SELECT")
      F.col(name).cast(DecimalType(18, d.scale))
    case ByteType | ShortType | IntegerType | LongType =>
      F.col(name).cast(DecimalType(18, 0))
    case other => throw new IllegalArgumentException(
      s"linear_reg column '$name' is ${other.simpleString} — features and label must be " +
        "integral or DECIMAL so training sums are exact (cast doubles to a DECIMAL of " +
        "their true width in the AS SELECT, e.g. CAST(x AS DECIMAL(18,2)))")
  }

  /** One aggregate pass → the intercept-augmented Gram sums, already
    * converted to doubles: (n, S, v, syy) where S(i)(j) = Σ aᵢaⱼ and
    * v(i) = Σ aᵢ·y over a = (1, f₁ … fₚ). NULL features/labels are
    * loud (BigQuery drops such rows silently; silence would corrupt
    * the sums here).
    */
  private[graft] def gramSums(df: DataFrame, featureCols: Seq[String], labelCol: String)
      : (Long, Array[Array[Double]], Array[Double], Double) = {
    val p = featureCols.length
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val d = featureCols.map(c => exactCast(c, fields(c)))
    val y = exactCast(labelCol, fields(labelCol))
    val aggs = scala.collection.mutable.ArrayBuffer.empty[Column]
    aggs += F.count(F.lit(1)).as("n")
    // null guards: count(col) skips nulls — any shortfall is loud
    (featureCols :+ labelCol).zipWithIndex.foreach { case (c, i) =>
      aggs += F.count(F.col(c)).as(s"nn_$i")
    }
    for (i <- 0 until p) {
      aggs += F.sum(d(i)).as(s"sx_$i")
      aggs += F.sum(d(i) * y).as(s"sxy_$i")
      for (j <- i until p) aggs += F.sum(d(i) * d(j)).as(s"sxx_${i}_$j")
    }
    aggs += F.sum(y).as("sy")
    aggs += F.sum(y * y).as("syy")
    val row = df.agg(aggs.head, aggs.tail.toSeq: _*).collect().head
    val n = row.getLong(row.fieldIndex("n"))
    require(n > 0, "linear_reg: empty training input")
    (0 to p).foreach { i =>
      require(row.getLong(row.fieldIndex(s"nn_$i")) == n,
        s"linear_reg: NULL values in '${(featureCols :+ labelCol)(i)}' — " +
          "filter or coalesce them in the AS SELECT")
    }
    def dbl(name: String): Double = {
      val v = row.getDecimal(row.fieldIndex(name))
      require(v != null, s"linear_reg: the exact sum '$name' overflowed DECIMAL(38,_) — " +
        "reduce the input's decimal width")
      v.doubleValue()
    }
    // augmented: index 0 = the intercept column of ones
    val s = Array.ofDim[Double](p + 1, p + 1)
    val v = Array.ofDim[Double](p + 1)
    s(0)(0) = n.toDouble
    v(0) = dbl("sy")
    for (i <- 0 until p) {
      s(0)(i + 1) = dbl(s"sx_$i"); s(i + 1)(0) = s(0)(i + 1)
      v(i + 1) = dbl(s"sxy_$i")
      for (j <- i until p) {
        s(i + 1)(j + 1) = dbl(s"sxx_${i}_$j"); s(j + 1)(i + 1) = s(i + 1)(j + 1)
      }
    }
    (n, s, v, dbl("syy"))
  }

  /** Solve the normal equations S·b = v. p = 1 is the stated closed
    * form (the textual shape independent engines replay); p ≥ 2 is
    * Gaussian elimination with partial pivoting — deterministic given
    * the (exact-sum-derived) inputs.
    */
  private[graft] def solve(s: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val m = v.length
    if (m == 2) {
      // closed form: (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx), left-to-right
      val den = s(0)(0) * s(1)(1) - s(0)(1) * s(0)(1)
      require(den != 0.0, "linear_reg: degenerate fit (zero feature variance)")
      val b1 = (s(0)(0) * v(1) - s(0)(1) * v(0)) / den
      val b0 = (v(0) - b1 * s(0)(1)) / s(0)(0)
      return Array(b0, b1)
    }
    val a = Array.tabulate(m, m)((i, j) => s(i)(j))
    val b = v.clone()
    for (k <- 0 until m) {
      var piv = k
      for (r <- k + 1 until m) if (math.abs(a(r)(k)) > math.abs(a(piv)(k))) piv = r
      require(a(piv)(k) != 0.0,
        "linear_reg: singular normal equations (collinear or constant features)")
      if (piv != k) { val t = a(piv); a(piv) = a(k); a(k) = t
        val tb = b(piv); b(piv) = b(k); b(k) = tb }
      for (r <- k + 1 until m) {
        val f = a(r)(k) / a(k)(k)
        for (c <- k until m) a(r)(c) -= f * a(k)(c)
        b(r) -= f * b(k)
      }
    }
    val x = Array.ofDim[Double](m)
    for (k <- m - 1 to 0 by -1) {
      var acc = b(k)
      for (c <- k + 1 until m) acc -= a(k)(c) * x(c)
      x(k) = acc / a(k)(k)
    }
    x
  }

  /** Train: one Gram pass + the driver solve. Returns (b₀, b₁ … bₚ). */
  def train(df: DataFrame, featureCols: Seq[String], labelCol: String): Array[Double] = {
    require(featureCols.nonEmpty && featureCols.length <= 16,
      s"linear_reg supports 1..16 features, got ${featureCols.length}")
    val (_, s, v, _) = gramSums(df, featureCols, labelCol)
    solve(s, v)
  }

  /** The prediction expression: b₀ + b₁·f₁ + … (left-to-right fold —
    * the textual shape the oracle replays), features cast to double.
    */
  def predictExpr(coef: Seq[Double], featureCols: Seq[String]): Column =
    featureCols.zipWithIndex.foldLeft(F.lit(coef.head): Column) { case (acc, (c, i)) =>
      acc + F.lit(coef(i + 1)) * F.col(c).cast("double")
    }

  /** ML.EVALUATE for a trained fit: one Gram pass over the EVALUATE
    * input, then mean_squared_error and r2_score as FIXED textual
    * folds over the exact-sum doubles (replayable; the algebraic
    * route — SSE = Σy² − 2bᵀ(Xᵀy) + bᵀ(XᵀX)b — avoids the per-row
    * double residuals whose summation order no independent engine
    * reproduces):
    *   sse = syy − 2·b₀·v₀ − … − 2·bₚ·vₚ + Σᵢⱼ (bᵢ·bⱼ)·Sᵢⱼ  (i outer, j inner)
    *   mse = sse / n
    *   sst = syy − sy·sy / n
    *   r2  = 1 − sse / sst
    * BigQuery's remaining metrics (mean_absolute_error,
    * median_absolute_error, mean_squared_log_error, explained_variance)
    * are stated omissions: each is a corpus-wide fold of per-row
    * doubles (the A48 log_loss note applies).
    */
  def evaluate(df: DataFrame, featureCols: Seq[String], labelCol: String,
               coef: Seq[Double]): DataFrame = {
    val p = featureCols.length
    require(coef.length == p + 1, s"${coef.length} coefficients for $p features")
    val (n, s, v, syy) = gramSums(df, featureCols, labelCol)
    var sse = syy
    for (i <- 0 to p) sse -= 2.0 * coef(i) * v(i)
    for (i <- 0 to p; j <- 0 to p) sse += coef(i) * coef(j) * s(i)(j)
    val mse = sse / n.toDouble
    val sst = syy - v(0) * v(0) / n.toDouble
    require(sst != 0.0, "linear_reg ML.EVALUATE: constant label (r2 undefined)")
    val r2 = 1.0 - sse / sst
    val spark = df.sparkSession
    import spark.implicits._
    Seq((mse, r2)).toDF("mean_squared_error", "r2_score")
  }
}
