package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native evaluation of the geography vertex-array folds (r16
  * optimization round, guide §1.2 step 2 / §4.1: prefer codegen over
  * interpreted lambdas in the hot path).
  *
  * The round-15/16 geography measures were spelled as SQL
  * higher-order functions (`aggregate`/`transform` lambdas over the
  * ARRAY<STRUCT<lng, lat>> carrier). HOFs are CodegenFallback in
  * Spark: every per-edge step walks an interpreted expression tree —
  * element_at + field access + trig per vertex per row. These
  * expressions compute the IDENTICAL arithmetic — same operations,
  * same left-to-right fold order, same `java.lang.Math` functions the
  * SQL built-ins bind to (sin/cos/asin/atan2/sqrt/floor/abs,
  * toRadians/toDegrees), same IEEE associativity as the old SQL text
  * — in one tight JIT'd loop per row, so every result is BIT-FOR-BIT
  * the value the old spelling produced (the TypedSqlSpec exact-value
  * pins and the DuckDB face hashes gate this). All implement
  * `doGenCode` (no CodegenFallback), so the geography projections
  * stay inside their whole-stage-codegen span.
  *
  * Null semantics mirror the SQL text where an input can actually be
  * null through the public constructors: a null ARRAY yields null
  * (the old CASE/aggregate chain propagated null the same way); a
  * null point argument follows each fold's SQL three-valued result
  * (ray cast → false, boundary test → null), spelled out per class.
  * Vertex FIELDS are non-null by carrier construction (every
  * constructor raises or casts from non-null arithmetic).
  */
object geofold {
  val PointStruct: StructType = StructType(Seq(
    StructField("lng", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false)))
  val RingType: ArrayType = ArrayType(PointStruct, containsNull = false)

  final val R = 6371010.0 // BigQuery's documented spherical radius (m)

  /** Haversine — the exact operation/association order of the SQL
    * text `2.0D * 6371010.0D * asin(sqrt(dlat*dlat + cos(radians(
    * a.lat)) * cos(radians(b.lat)) * dlng*dlng))` (constant product
    * 2·R folds first, exactly like Catalyst's ConstantFolding did).
    */
  def haversine(aLng: Double, aLat: Double, bLng: Double, bLat: Double): Double = {
    val dlat = Math.sin(Math.toRadians((bLat - aLat) / 2.0))
    val dlng = Math.sin(Math.toRadians((bLng - aLng) / 2.0))
    (2.0 * R) * Math.asin(Math.sqrt(
      dlat * dlat + Math.cos(Math.toRadians(aLat)) * Math.cos(Math.toRadians(bLat)) * dlng * dlng))
  }
}

/** ST_LENGTH / ST_PERIMETER: left-to-right haversine segment-sum fold
  * over the vertex array; size < 2 → 0.0 (the old CASE guard).
  */
case class GeoSegmentSum(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(geofold.RingType)
  override def dataType: DataType = DoubleType
  def compute(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n < 2) return 0.0
    var acc = 0.0
    var i = 0
    while (i < n - 1) {
      val a = arr.getStruct(i, 2); val b = arr.getStruct(i + 1, 2)
      acc = acc + geofold.haversine(a.getDouble(0), a.getDouble(1), b.getDouble(0), b.getDouble(1))
      i += 1
    }
    acc
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geoSegSum", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): GeoSegmentSum =
    copy(child = newChild)
}

/** ST_AREA: the spherical-shoelace (Chamberlain–Duquette) fold —
  * |Σ Δλ·(2 + sin φᵢ + sin φᵢ₊₁)|·R²/2 with Δλ wrapped into [−π, π]
  * by the IEEE-exact floor; size < 4 → 0.0. Operation order matches
  * the SQL text exactly (τ = 2·π folds first; the final scale is
  * ((abs·R)·R)/2).
  */
case class GeoRingArea(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(geofold.RingType)
  override def dataType: DataType = DoubleType
  def compute(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n < 4) return 0.0
    val tau = 2.0 * Math.PI
    var acc = 0.0
    var i = 0
    while (i < n - 1) {
      val a = arr.getStruct(i, 2); val b = arr.getStruct(i + 1, 2)
      val la = Math.toRadians(a.getDouble(0))
      val lb = Math.toRadians(b.getDouble(0))
      val dl = lb - la
      val dln = dl - tau * Math.floor(dl / tau + 0.5)
      acc = acc + dln * (2.0 + Math.sin(Math.toRadians(a.getDouble(1))) +
        Math.sin(Math.toRadians(b.getDouble(1))))
      i += 1
    }
    Math.abs(acc) * geofold.R * geofold.R / 2.0
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geoRingArea", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): GeoRingArea =
    copy(child = newChild)
}

/** ST_CONTAINS / ST_INTERSECTS / ST_WITHIN (flipped) / ST_DISJOINT
  * (negated by the caller): the planar even-odd ray cast with strict
  * inequalities — exact IEEE compare/multiply/divide in the SQL
  * text's order. size < 4 → false; a null ring → null; a null point
  * contributes no crossing (the SQL CASE treated the null condition
  * as not-true), so the result is false — same three-valued outcome
  * as the old spelling.
  */
case class GeoRayCast(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(geofold.RingType, geofold.PointStruct)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable
  def compute(arr: ArrayData, pt: InternalRow): Boolean = {
    val n = arr.numElements()
    if (n < 4) return false
    val qLng = pt.getDouble(0); val qLat = pt.getDouble(1)
    var crossings = 0
    var i = 0
    while (i < n - 1) {
      val a = arr.getStruct(i, 2); val b = arr.getStruct(i + 1, 2)
      val aLat = a.getDouble(1); val bLat = b.getDouble(1)
      if ((aLat > qLat) != (bLat > qLat)) {
        val aLng = a.getDouble(0); val bLng = b.getDouble(0)
        if (qLng < (bLng - aLng) * (qLat - aLat) / (bLat - aLat) + aLng) crossings += 1
      }
      i += 1
    }
    crossings % 2 == 1
  }
  override def eval(input: InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) return null
    val a = arr.asInstanceOf[ArrayData]
    if (a.numElements() < 4) return false
    val pt = right.eval(input)
    if (pt == null) return false // null comparisons count no crossing
    compute(a, pt.asInstanceOf[InternalRow])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geoRayCast", this)
    val l = left.genCode(ctx); val r = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${l.code}
        boolean ${ev.isNull} = false;
        boolean ${ev.value} = false;
        if (${l.isNull}) {
          ${ev.isNull} = true;
        } else if (${l.value}.numElements() < 4) {
          ${ev.value} = false;
        } else {
          ${r.code}
          if (${r.isNull}) {
            ${ev.value} = false;
          } else {
            ${ev.value} = $ref.compute(${l.value}, ${r.value});
          }
        }
      """)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GeoRayCast =
    copy(left = newLeft, right = newRight)
}

/** ST_TOUCHES / the boundary half of ST_COVERS: exact on-segment test
  * (cross product = 0 AND inside the segment bbox) OR-folded over the
  * segments. size < 2 → false; null ring → null; a null point makes
  * every term null, so `false OR null … = null` — preserved.
  */
case class GeoOnBoundary(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(geofold.RingType, geofold.PointStruct)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  def compute(arr: ArrayData, pt: InternalRow): Boolean = {
    val n = arr.numElements()
    val qLng = pt.getDouble(0); val qLat = pt.getDouble(1)
    var i = 0
    while (i < n - 1) {
      val a = arr.getStruct(i, 2); val b = arr.getStruct(i + 1, 2)
      val aLng = a.getDouble(0); val aLat = a.getDouble(1)
      val bLng = b.getDouble(0); val bLat = b.getDouble(1)
      if ((bLng - aLng) * (qLat - aLat) == (bLat - aLat) * (qLng - aLng) &&
        qLng >= Math.min(aLng, bLng) && qLng <= Math.max(aLng, bLng) &&
        qLat >= Math.min(aLat, bLat) && qLat <= Math.max(aLat, bLat)) return true
      i += 1
    }
    false
  }
  override def eval(input: InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) return null
    val a = arr.asInstanceOf[ArrayData]
    if (a.numElements() < 2) return false
    val pt = right.eval(input)
    if (pt == null) return null // every OR term is null → null
    compute(a, pt.asInstanceOf[InternalRow])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geoOnBoundary", this)
    val l = left.genCode(ctx); val r = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${l.code}
        boolean ${ev.isNull} = false;
        boolean ${ev.value} = false;
        if (${l.isNull}) {
          ${ev.isNull} = true;
        } else if (${l.value}.numElements() < 2) {
          ${ev.value} = false;
        } else {
          ${r.code}
          if (${r.isNull}) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = $ref.compute(${l.value}, ${r.value});
          }
        }
      """)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GeoOnBoundary =
    copy(left = newLeft, right = newRight)
}

/** ST_CENTROID: the planar shoelace centroid — one (2A, Σ(xᵢ+xᵢ₊₁)·crᵢ,
  * Σ(yᵢ+yᵢ₊₁)·crᵢ) fold finished by /(3·2A), the SQL text's exact
  * operation order. A ring below 2 vertices is loud (the old
  * spelling's reversed `sequence` hit the element_at(…, 0) error on
  * such inputs — no constructor can produce them).
  */
case class GeoCentroid(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(geofold.RingType)
  override def dataType: DataType = geofold.PointStruct
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    require(n >= 2, s"ST_CENTROID: the ring carrier needs at least 2 vertices, got $n")
    var sa = 0.0; var sx = 0.0; var sy = 0.0
    var i = 0
    while (i < n - 1) {
      val a = arr.getStruct(i, 2); val b = arr.getStruct(i + 1, 2)
      val xi = a.getDouble(0); val yi = a.getDouble(1)
      val xj = b.getDouble(0); val yj = b.getDouble(1)
      val cr = xi * yj - xj * yi
      sa = sa + cr
      sx = sx + (xi + xj) * cr
      sy = sy + (yi + yj) * cr
      i += 1
    }
    InternalRow(sx / (3.0 * sa), sy / (3.0 * sa))
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geoCentroid", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): GeoCentroid =
    copy(child = newChild)
}

/** ST_BOUNDINGBOX: one pass for all four extrema (the SQL text ran
  * four interpreted transform+array_min/max folds). Empty array →
  * null fields, like array_min(empty).
  */
case class GeoBoundingBox(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(geofold.RingType)
  override def dataType: DataType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("ymin", DoubleType),
    StructField("xmax", DoubleType), StructField("ymax", DoubleType)))
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return InternalRow(null, null, null, null)
    var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val p = arr.getStruct(i, 2)
      val x = p.getDouble(0); val y = p.getDouble(1)
      // array_min/max use ordering semantics (NaN sorts greatest);
      // mirror with explicit compares, not Math.min/max
      if (java.lang.Double.compare(x, xmin) < 0) xmin = x
      if (java.lang.Double.compare(y, ymin) < 0) ymin = y
      if (java.lang.Double.compare(x, xmax) > 0) xmax = x
      if (java.lang.Double.compare(y, ymax) > 0) ymax = y
      i += 1
    }
    InternalRow(xmin, ymin, xmax, ymax)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geoBBox", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): GeoBoundingBox =
    copy(child = newChild)
}

/** ST_MAXDISTANCE: max haversine over the vertex cross product (exact
  * for geodesic segments — endpoint-maximal). Either side empty →
  * null, like array_max(empty).
  */
case class GeoMaxDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(geofold.RingType, geofold.RingType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  def compute(x: ArrayData, y: ArrayData): Any = {
    val n = x.numElements(); val m = y.numElements()
    if (n == 0 || m == 0) return null
    var best = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val a = x.getStruct(i, 2)
      val aLng = a.getDouble(0); val aLat = a.getDouble(1)
      var j = 0
      while (j < m) {
        val b = y.getStruct(j, 2)
        val d = geofold.haversine(aLng, aLat, b.getDouble(0), b.getDouble(1))
        // array_max ordering (NaN greatest) — explicit compare
        if (java.lang.Double.compare(d, best) > 0) best = d
        j += 1
      }
      i += 1
    }
    best
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geoMaxDist", this)
    val tmp = ctx.freshName("gmd")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $tmp = $ref.compute($a, $b);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $tmp).doubleValue(); }
    """)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GeoMaxDistance =
    copy(left = newLeft, right = newRight)
}

/** ST_SNAPTOGRID: per-vertex floor(x/s + 0.5)·s quantization — the
  * SQL transform's exact arithmetic, one loop.
  */
case class GeoSnapToGrid(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(geofold.RingType, DoubleType)
  override def dataType: DataType = geofold.RingType
  def compute(arr: ArrayData, gs: Double): GenericArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val p = arr.getStruct(i, 2)
      out(i) = InternalRow(
        Math.floor(p.getDouble(0) / gs + 0.5) * gs,
        Math.floor(p.getDouble(1) / gs + 0.5) * gs)
      i += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geoSnap", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GeoSnapToGrid =
    copy(left = newLeft, right = newRight)
}

/** ST_BUFFER(point, r): BigQuery's default 32-gon via the spherical
  * destination formula — the SQL transform's exact per-vertex
  * arithmetic (closure vertex i = 32 repeats i % 32 = 0 bit-for-bit),
  * one loop instead of 33 interpreted lambda evaluations × ~10
  * libm-node walks each.
  */
case class GeoBuffer(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(geofold.PointStruct, DoubleType)
  override def dataType: DataType = geofold.RingType
  def compute(pt: InternalRow, r: Double): GenericArrayData = {
    val lng = pt.getDouble(0); val lat = pt.getDouble(1)
    val dl = r / geofold.R
    val phi = Math.toRadians(lat)
    val sinPhi = Math.sin(phi); val cosPhi = Math.cos(phi)
    val sinDl = Math.sin(dl); val cosDl = Math.cos(dl)
    val lngRad = Math.toRadians(lng)
    val out = new Array[Any](33)
    var i = 0
    while (i <= 32) {
      val th = ((i % 32).toDouble * Math.PI) / 16.0
      val sinLat2 = sinPhi * cosDl + cosPhi * sinDl * Math.cos(th)
      val lng2 = lngRad + Math.atan2(Math.sin(th) * sinDl * cosPhi, cosDl - sinPhi * sinLat2)
      out(i) = InternalRow(Math.toDegrees(lng2), Math.toDegrees(Math.asin(sinLat2)))
      i += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[InternalRow], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geoBuffer", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GeoBuffer =
    copy(left = newLeft, right = newRight)
}

/** ST_GEOGFROMTEXT (POINT): one compiled-regex parse per row instead
  * of the old 4 regex evaluations (RLIKE + regexp_extract per
  * coordinate). Numeric strictness follows the round-15 WKT rule
  * (GeogFromText.WktNum): plain decimals with optional exponent —
  * Java-isms ('1d', hex floats, Infinity) stay loud. Latitude outside
  * ±90 raises with ST_GEOGPOINT's message, like the rewritten SQL did.
  */
case class GeogPointFromText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = geofold.PointStruct
  @transient private lazy val Pat =
    java.util.regex.Pattern.compile("""(?i)^\s*POINT\s*\(\s*(\S+)\s+(\S+)\s*\)\s*$""")
  @transient private lazy val WktNum =
    java.util.regex.Pattern.compile("""[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?""")
  private def fail(wkt: String): Nothing =
    throw new IllegalArgumentException(
      "ST_GEOGFROMTEXT: only POINT(lng lat) WKT is supported (use ST_LINEFROMTEXT / " +
        s"ST_POLYGONFROMTEXT for the line and ring carriers), got $wkt")
  def compute(s: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    val wkt = s.toString
    val m = Pat.matcher(wkt)
    if (!m.matches()) fail(wkt)
    val (xs, ys) = (m.group(1), m.group(2))
    if (!WktNum.matcher(xs).matches() || !WktNum.matcher(ys).matches()) fail(wkt)
    val lat = ys.toDouble
    if (Math.abs(lat) > 90.0)
      throw new IllegalArgumentException("ST_GEOGPOINT: latitude must be in [-90, 90]")
    InternalRow(xs.toDouble, lat)
  }
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geogPointFromText", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): GeogPointFromText =
    copy(child = newChild)
}

/** ST_GEOGFROMGEOJSON (Point): one Jackson parse per row instead of
  * three get_json_object evaluations (type + each coordinate). Same
  * loud contract as the rewritten SQL: non-Point type or unparseable
  * JSON raises the only-Point message; a missing / non-numeric
  * coordinate raises the coordinates[i] message (numeric STRINGS keep
  * parsing, matching the old CAST path); latitude outside ±90 raises
  * ST_GEOGPOINT's message.
  */
case class GeogPointFromGeoJson(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = geofold.PointStruct
  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def failType(j: String): Nothing =
    throw new IllegalArgumentException(
      s"""ST_GEOGFROMGEOJSON: only {"type":"Point",...} is supported, got $j""")
  private def coord(j: String, node: com.fasterxml.jackson.databind.JsonNode, i: Int): Double = {
    val cs = node.get("coordinates")
    val c = if (cs == null) null else cs.get(i)
    val ok = c != null && (c.isNumber ||
      (c.isTextual && scala.util.Try(java.lang.Double.parseDouble(c.asText())).isSuccess))
    if (!ok) throw new IllegalArgumentException(
      s"ST_GEOGFROMGEOJSON: coordinates[$i] missing or not a number in $j")
    if (c.isNumber) c.asDouble() else java.lang.Double.parseDouble(c.asText())
  }
  def compute(s: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    val j = s.toString
    val node = try mapper.readTree(j) catch { case _: Exception => failType(j) }
    if (node == null || !node.isObject) failType(j)
    val t = node.get("type")
    if (t == null || !t.isTextual || t.asText() != "Point") failType(j)
    val lng = coord(j, node, 0)
    val lat = coord(j, node, 1)
    if (Math.abs(lat) > 90.0)
      throw new IllegalArgumentException("ST_GEOGPOINT: latitude must be in [-90, 90]")
    InternalRow(lng, lat)
  }
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geogPointFromGeoJson", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): GeogPointFromGeoJson =
    copy(child = newChild)
}
