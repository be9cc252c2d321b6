package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, NullNode, ObjectNode}

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BigQuery's JSON MUTATOR family — JSON_SET / JSON_REMOVE /
  * JSON_ARRAY_APPEND / JSON_STRIP_NULLS — over the engine's
  * STRING-carried JSON (the same representation the B21/B50/B51
  * accessor family reads; reference: the dags' raw-JSON rate
  * payloads). Implemented as native Catalyst expressions on Jackson
  * (already on every Spark classpath): parse → mutate → compact
  * re-serialization (insertion-ordered fields — a set lands new keys
  * LAST, which is also BigQuery's observable behavior).
  *
  * Path dialect: `$`, `$.field`, `$.a.b[0].c` — unquoted member names
  * and non-negative array indexes; anything else is loud at bind time
  * (paths are constructor constants, so a bad path fails the QUERY,
  * not a row). Mutation semantics (the BigQuery rules):
  *
  *  - SET walks the path CREATING the missing remainder, typed by
  *    lookahead (next step an index → array, a member → object — so
  *    JSON_SET('{"a":1}', '$.b[2]', 9) gives {"a":1,"b":[null,null,9]},
  *    BigQuery's recursive-creation rule); a step that hits an
  *    incompatible PRE-EXISTING node (scalar where a container is
  *    needed) makes the whole operation a NO-OP — and since
  *    incompatibility is only possible before any creation starts, a
  *    no-op leaves the input byte-identical (no created residue).
  *    Array indexes beyond the end pad with JSON nulls.
  *  - REMOVE deletes the path if present (array removal shifts left);
  *    a missing path is a no-op; removing `$` is loud.
  *  - ARRAY_APPEND appends one value to the array at the path; a
  *    non-array target is a no-op.
  *  - STRIP_NULLS removes null-valued object members and null array
  *    elements recursively (BigQuery's include_arrays=>true default);
  *    empty containers stay (remove_empty=>false default).
  *
  * Invalid or NULL input JSON yields NULL (the try_parse discipline
  * the accessor family set). All expressions keep whole-stage codegen
  * via the repo's compute-call pattern.
  */
object JsonMut {
  private val mapper = new ObjectMapper()

  /** Parsed path: Left(field) object step, Right(index) array step. */
  type Step = Either[String, Int]

  def parsePath(path: String): Seq[Step] = {
    require(path.startsWith("$"), s"JSON path must start with $$: $path")
    val out = scala.collection.mutable.ListBuffer.empty[Step]
    var i = 1
    while (i < path.length) {
      path.charAt(i) match {
        case '.' =>
          val e0 = path.indexWhere(c => c == '.' || c == '[', i + 1)
          val e = if (e0 < 0) path.length else e0
          val f = path.substring(i + 1, e)
          require(f.nonEmpty && f.forall(c => Character.isLetterOrDigit(c) || c == '_' || c == '-'),
            s"unsupported JSON path member '$f' in $path (unquoted names only)")
          out += Left(f); i = e
        case '[' =>
          val e = path.indexOf(']', i)
          require(e > i + 1, s"unterminated array index in JSON path $path")
          val ix = path.substring(i + 1, e)
          require(ix.forall(Character.isDigit), s"JSON path index must be a non-negative integer: $path")
          out += Right(ix.toInt); i = e + 1
        case other =>
          throw new IllegalArgumentException(s"unsupported JSON path syntax '$other' in $path")
      }
    }
    out.toSeq
  }

  def tryParse(j: UTF8String): JsonNode =
    if (j == null) null
    else try mapper.readTree(j.toString) catch { case _: Exception => null }

  def out(n: JsonNode): UTF8String = UTF8String.fromString(mapper.writeValueAsString(n))

  def newObject(): ObjectNode = mapper.createObjectNode()
  def newArray(): ArrayNode = mapper.createArrayNode()

  /** Navigate along `steps`; null if any step is missing/incompatible.
    * Read-only — never mutates.
    */
  private def walk(root: JsonNode, steps: Seq[Step]): JsonNode = {
    var cur = root
    steps.foreach { st =>
      if (cur == null) return null
      (cur, st) match {
        case (o: ObjectNode, Left(f)) => cur = o.get(f)
        case (a: ArrayNode, Right(ix)) =>
          cur = if (ix < a.size) a.get(ix) else null
        case _ => return null
      }
    }
    cur
  }

  /** Navigate to the PARENT of the final step for the SET family.
    * `create=true` recursively creates the missing remainder of the
    * path, TYPED BY LOOKAHEAD at the following step (next step is an
    * index → create/pad an array; a member name → an object) — the
    * BigQuery rule, e.g. JSON_SET('{"a":1}', '$.b[2]', 9) yields
    * {"a":1,"b":[null,null,9]}. Never overwrites existing scalars —
    * an incompatible PRE-EXISTING node returns null BEFORE anything
    * is created, so a no-op truly leaves the input unchanged (once
    * creation starts, every deeper node is fresh and lookahead-typed,
    * so no later step can fail).
    */
  private def walkToParent(root: JsonNode, steps: Seq[Step], create: Boolean): JsonNode = {
    var cur = root
    var i = 0
    while (i < steps.length - 1) {
      if (cur == null) return null
      val wantArray = steps(i + 1).isRight
      (cur, steps(i)) match {
        case (o: ObjectNode, Left(f)) =>
          var nxt = o.get(f)
          if (nxt == null && create)
            nxt = if (wantArray) o.putArray(f) else o.putObject(f)
          cur = nxt
        case (a: ArrayNode, Right(ix)) =>
          if (ix < a.size) cur = a.get(ix)
          else if (create) {
            while (a.size < ix) a.add(NullNode.getInstance)
            cur = if (wantArray) a.addArray() else a.addObject()
          } else cur = null
        case _ => return null
      }
      i += 1
    }
    cur
  }

  /** `mode`: "set" (create or overwrite — JSON_SET), "insert" (create
    * only, existing values untouched — JSON_INSERT), "replace"
    * (overwrite only, missing paths untouched — JSON_REPLACE). The
    * BigQuery trio shares one walk.
    */
  def set(root: JsonNode, steps: Seq[Step], value: JsonNode,
          mode: String = "set"): JsonNode = {
    if (steps.isEmpty)
      return if (mode == "insert") root else value.deepCopy[JsonNode]()
    val parent = walkToParent(root, steps, create = mode != "replace")
    (parent, steps.last) match {
      case (o: ObjectNode, Left(f)) =>
        val exists = o.get(f) != null
        if ((mode == "insert" && exists) || (mode == "replace" && !exists)) root
        else { o.set[JsonNode](f, value.deepCopy[JsonNode]()); root }
      case (a: ArrayNode, Right(ix)) =>
        if (ix < a.size) {
          if (mode != "insert") a.set(ix, value.deepCopy[JsonNode]())
        } else if (mode != "replace") {
          while (a.size < ix) a.add(NullNode.getInstance)
          a.add(value.deepCopy[JsonNode]())
        }
        root
      case _ => root // incompatible parent: the whole operation no-ops
    }
  }

  /** JSON_ARRAY_INSERT: insert at the path's final index, SHIFTING
    * the tail right; beyond-end pads with JSON nulls first. The final
    * step must be an array index and its parent an array — anything
    * else no-ops (the mutator family's rule).
    */
  def arrayInsert(root: JsonNode, steps: Seq[Step], value: JsonNode): JsonNode = {
    require(steps.nonEmpty && steps.last.isRight,
      "JSON_ARRAY_INSERT's path must end in an array index (e.g. $.a[1])")
    val parent = walk(root, steps.init)
    (parent, steps.last) match {
      case (a: ArrayNode, Right(ix)) =>
        while (a.size < ix) a.add(NullNode.getInstance)
        a.insert(ix, value.deepCopy[JsonNode]())
        root
      case _ => root
    }
  }

  /** BigQuery JSON_TYPE names for a node. */
  def typeName(n: JsonNode): String =
    if (n.isObject) "object"
    else if (n.isArray) "array"
    else if (n.isTextual) "string"
    else if (n.isNumber) "number"
    else if (n.isBoolean) "boolean"
    else "null"

  def remove(root: JsonNode, steps: Seq[Step]): JsonNode = {
    require(steps.nonEmpty, "JSON_REMOVE of the root $ is not allowed")
    val parent = walk(root, steps.init)
    (parent, steps.last) match {
      case (o: ObjectNode, Left(f)) => o.remove(f); root
      case (a: ArrayNode, Right(ix)) => if (ix < a.size) a.remove(ix); root
      case _ => root
    }
  }

  def arrayAppend(root: JsonNode, steps: Seq[Step], value: JsonNode): JsonNode = {
    val target = walk(root, steps)
    target match {
      case a: ArrayNode => a.add(value.deepCopy[JsonNode]()); root
      case _ => root // non-array target: no-op
    }
  }

  def stripNulls(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val names = scala.collection.mutable.ListBuffer.empty[String]
      val it = o.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNull) names += e.getKey
        else stripNulls(e.getValue)
      }
      names.foreach(o.remove)
      o
    case a: ArrayNode =>
      var i = 0
      while (i < a.size) {
        if (a.get(i).isNull) a.remove(i)
        else { stripNulls(a.get(i)); i += 1 }
      }
      a
    case other => other
  }

  /** One Spark value → a Jackson node, by static type. */
  def encode(v: Any, dt: DataType): JsonNode = {
    if (v == null) return NullNode.getInstance
    dt match {
      case StringType => mapper.getNodeFactory.textNode(v.asInstanceOf[UTF8String].toString)
      case LongType => mapper.getNodeFactory.numberNode(v.asInstanceOf[Long])
      case IntegerType => mapper.getNodeFactory.numberNode(v.asInstanceOf[Int])
      case ShortType => mapper.getNodeFactory.numberNode(v.asInstanceOf[Short].toInt)
      case ByteType => mapper.getNodeFactory.numberNode(v.asInstanceOf[Byte].toInt)
      case DoubleType => mapper.getNodeFactory.numberNode(v.asInstanceOf[Double])
      case FloatType => mapper.getNodeFactory.numberNode(v.asInstanceOf[Float].toDouble)
      case BooleanType => mapper.getNodeFactory.booleanNode(v.asInstanceOf[Boolean])
      case d: DecimalType =>
        mapper.getNodeFactory.numberNode(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal)
      case other => throw new IllegalArgumentException(
        s"JSON mutator value type $other is not supported (scalars only)")
    }
  }
}

/** JSON_OBJECT(k1, v1, k2, v2, ...) / JSON_ARRAY(v1, ...) — the JSON
  * CONSTRUCTORS, same string-carried model as the mutators. Values
  * encode by their SQL type ([[JsonMut.encode]] — scalars only, loud
  * otherwise; a NULL value is a JSON null). Keys must be non-NULL
  * strings (BigQuery raises there too). Duplicate keys: LAST wins,
  * earlier position kept (Jackson set-on-existing semantics — matches
  * BigQuery). Stated trade: the engine has no JSON type, so a value
  * that is itself JSON TEXT embeds as an escaped string — spell
  * nesting with JSON_SET over a literal object instead.
  */
case class JsonBuild(children: Seq[Expression], isObject: Boolean)
    extends Expression {
  if (isObject) require(children.size % 2 == 0,
    "JSON_OBJECT takes alternating (key, value) arguments")
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    compute(children.map(_.eval(input)).toArray)
  def compute(vals: Array[Any]): UTF8String = {
    if (isObject) {
      val o = JsonMut.newObject()
      var i = 0
      while (i < vals.length) {
        val k = vals(i)
        require(k != null, "JSON_OBJECT key is NULL")
        require(k.isInstanceOf[UTF8String],
          s"JSON_OBJECT keys must be strings, got ${children(i).dataType}")
        o.set[JsonNode](k.asInstanceOf[UTF8String].toString,
          JsonMut.encode(vals(i + 1), children(i + 1).dataType))
        i += 2
      }
      JsonMut.out(o)
    } else {
      val a = JsonMut.newArray()
      var i = 0
      while (i < vals.length) {
        a.add(JsonMut.encode(vals(i), children(i).dataType))
        i += 1
      }
      JsonMut.out(a)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonBuild", this)
    val evs = children.map(_.genCode(ctx))
    val arr = ctx.freshName("jsonArgs")
    // explicit boxing: Janino has no primitive-to-Object cast boxing
    val fills = evs.zipWithIndex.map { case (e, i) =>
      val boxed = children(i).dataType match {
        case BooleanType | ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType =>
          s"${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.boxedType(children(i).dataType)}.valueOf(${e.value})"
        case _ => s"${e.value}"
      }
      s"$arr[$i] = ${e.isNull} ? null : (Object) $boxed;"
    }.mkString("\n")
    val childCode = evs.map(_.code.toString).mkString("\n")
    ev.copy(code = code"""
      $childCode
      Object[] $arr = new Object[${children.size}];
      $fills
      UTF8String ${ev.value} = ((graft.functions.JsonBuild) $ref).compute($arr);
      boolean ${ev.isNull} = false;""")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): JsonBuild = copy(children = newChildren)
}

/** PARSE_JSON(s) — validate + CANONICALIZE to the mutator family's
  * compact form. Strict form raises on invalid JSON (BigQuery's
  * behavior); the SAFE form yields NULL. NULL input is NULL in both.
  * Stated divergence: numbers re-serialize from Jackson's parse
  * (shortest-roundtrip doubles), so exponent-form literals like
  * `1e2` come back as `100.0`; wide_number_mode is not supported.
  */
case class JsonCanon(child: Expression, safe: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  def compute(j: UTF8String): UTF8String = {
    val n = JsonMut.tryParse(j)
    if (n == null) {
      if (safe) null
      else throw new IllegalArgumentException(
        s"PARSE_JSON: invalid JSON (use SAFE.PARSE_JSON for NULL instead): ${j.toString.take(80)}")
    } else JsonMut.out(n)
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonCanon", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ((graft.functions.JsonCanon) $ref).compute($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): JsonCanon =
    copy(child = newChild)
}

/** JSON_SET / JSON_INSERT / JSON_REPLACE (by `mode`) — one
  * (path, value) pair; the SQL rewrite nests calls for multi-pair
  * spellings.
  */
case class JsonSet(left: Expression, right: Expression, path: String,
                   mode: String = "set")
    extends BinaryExpression {
  // the SQL rewrite casts the json argument to STRING; the value arg
  // is typed freely and encoded by its static type (JsonMut.encode)
  private val steps = JsonMut.parsePath(path)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  // the VALUE may be null (JSON null) — only a null/bad JSON input nulls out
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val j = left.eval(input)
    if (j == null) return null
    compute(j.asInstanceOf[UTF8String], right.eval(input))
  }
  def compute(j: UTF8String, v: Any): UTF8String = {
    val root = JsonMut.tryParse(j)
    if (root == null) null
    else JsonMut.out(JsonMut.set(root, steps, JsonMut.encode(v, right.dataType), mode))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonSet", this)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    // explicit boxing: Janino has no primitive-to-Object cast boxing
    val rBoxed = right.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType =>
        s"${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.boxedType(right.dataType)}.valueOf(${r.value})"
      case _ => s"${r.value}"
    }
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = ${l.isNull};
      UTF8String ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = ((graft.functions.JsonSet) $ref).compute(${l.value}, ${r.isNull} ? null : (Object) $rBoxed);
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JsonSet =
    copy(left = newLeft, right = newRight)
}

/** JSON_REMOVE(json, '<path>') — one path; the rewrite nests. */
case class JsonRemove(child: Expression, path: String)
    extends UnaryExpression with ExpectsInputTypes {
  private val steps = JsonMut.parsePath(path)
  require(steps.nonEmpty, "JSON_REMOVE of the root $ is not allowed")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  def compute(j: UTF8String): UTF8String = {
    val root = JsonMut.tryParse(j)
    if (root == null) null else JsonMut.out(JsonMut.remove(root, steps))
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonRemove", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ((graft.functions.JsonRemove) $ref).compute($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): JsonRemove =
    copy(child = newChild)
}

/** JSON_ARRAY_APPEND(json, '<path>', value) — single value append. */
case class JsonArrayAppend(left: Expression, right: Expression, path: String)
    extends BinaryExpression {
  // the SQL rewrite casts the json argument to STRING; the value arg
  // is typed freely and encoded by its static type (JsonMut.encode)
  private val steps = JsonMut.parsePath(path)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val j = left.eval(input)
    if (j == null) return null
    compute(j.asInstanceOf[UTF8String], right.eval(input))
  }
  def compute(j: UTF8String, v: Any): UTF8String = {
    val root = JsonMut.tryParse(j)
    if (root == null) null
    else JsonMut.out(JsonMut.arrayAppend(root, steps, JsonMut.encode(v, right.dataType)))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonArrayAppend", this)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    // explicit boxing: Janino has no primitive-to-Object cast boxing
    val rBoxed = right.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType =>
        s"${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.boxedType(right.dataType)}.valueOf(${r.value})"
      case _ => s"${r.value}"
    }
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = ${l.isNull};
      UTF8String ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = ((graft.functions.JsonArrayAppend) $ref).compute(${l.value}, ${r.isNull} ? null : (Object) $rBoxed);
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JsonArrayAppend =
    copy(left = newLeft, right = newRight)
}

/** JSON_STRIP_NULLS(json) — BigQuery defaults (include_arrays=>true,
  * remove_empty=>false); the named-argument spellings are loud in the
  * SQL rewrite.
  */
case class JsonStripNulls(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  def compute(j: UTF8String): UTF8String = {
    val root = JsonMut.tryParse(j)
    if (root == null) null else JsonMut.out(JsonMut.stripNulls(root))
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonStripNulls", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ((graft.functions.JsonStripNulls) $ref).compute($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): JsonStripNulls =
    copy(child = newChild)
}

/** JSON_ARRAY_INSERT(json, '<path>[i]', value) — shifting insert. */
case class JsonArrayInsert(left: Expression, right: Expression, path: String)
    extends BinaryExpression {
  private val steps = JsonMut.parsePath(path)
  require(steps.nonEmpty && steps.last.isRight,
    "JSON_ARRAY_INSERT's path must end in an array index (e.g. $.a[1])")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val j = left.eval(input)
    if (j == null) return null
    compute(j.asInstanceOf[UTF8String], right.eval(input))
  }
  def compute(j: UTF8String, v: Any): UTF8String = {
    val root = JsonMut.tryParse(j)
    if (root == null) null
    else JsonMut.out(JsonMut.arrayInsert(root, steps, JsonMut.encode(v, right.dataType)))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonArrayInsert", this)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val rBoxed = right.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType =>
        s"${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.boxedType(right.dataType)}.valueOf(${r.value})"
      case _ => s"${r.value}"
    }
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      boolean ${ev.isNull} = ${l.isNull};
      UTF8String ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = ((graft.functions.JsonArrayInsert) $ref).compute(${l.value}, ${r.isNull} ? null : (Object) $rBoxed);
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JsonArrayInsert =
    copy(left = newLeft, right = newRight)
}

/** JSON_KEYS(json[, max_depth][, mode => ...]) — BigQuery's key
  * enumeration: every object member reachable from the root, as a
  * UNIQUE, SORTED array of dotted paths (`["a", "a.b", "c"]`).
  *
  *  - `mode = "strict"` (default): recurse into nested OBJECTS only —
  *    arrays are opaque.
  *  - `"lax"`: additionally unwrap ONE level of arrays at each step
  *    (`{"a": [{"b": 1}]}` → `["a", "a.b"]`; a doubly-nested
  *    `[[{...}]]` stays opaque).
  *  - `"lax recursive"`: unwrap arrays of ANY nesting depth.
  *
  * `maxDepth` counts path segments (1 = top-level keys only); -1 (the
  * omitted spelling) is unbounded. Pinned details: sort order is
  * java.lang.String natural (code-unit) order; a key that is empty or
  * contains a character outside `[A-Za-z0-9_]` is emitted wrapped in
  * double quotes with `"` escaped (`{"a.b": 1}` → `"\"a.b\""`) so the
  * dotted path stays parseable; a root with no reachable keys (scalar
  * or, in strict mode, array) yields an EMPTY array — only NULL or
  * invalid JSON input yields NULL.
  */
case class JsonKeys(child: Expression, maxDepth: Int, mode: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(maxDepth == -1 || maxDepth >= 1,
    s"JSON_KEYS max_depth must be >= 1, got $maxDepth")
  require(Set("strict", "lax", "lax recursive").contains(mode),
    s"JSON_KEYS mode must be 'strict', 'lax' or 'lax recursive', got '$mode'")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  private def quoteKey(k: String): String =
    if (k.nonEmpty && k.forall(c => Character.isLetterOrDigit(c) || c == '_')) k
    else "\"" + k.replace("\"", "\\\"") + "\""

  // object nodes reachable from `n` without consuming a path segment:
  // n itself if an object; array elements per the mode's unwrap rule
  private def objectsAt(n: JsonNode, arrayLevels: Int,
                        out: scala.collection.mutable.ListBuffer[ObjectNode]): Unit = n match {
    case o: ObjectNode => out += o
    case a: ArrayNode if arrayLevels != 0 =>
      val it = a.elements()
      while (it.hasNext) objectsAt(it.next(), arrayLevels - 1, out)
    case _ =>
  }

  def compute(j: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val root = JsonMut.tryParse(j)
    if (root == null) return null
    val keys = scala.collection.mutable.TreeSet.empty[String]
    val unwrap = mode match {
      case "strict" => 0
      case "lax" => 1
      case _ => -1 // lax recursive: any depth
    }
    def walk(n: JsonNode, prefix: String, depth: Int): Unit = {
      val objs = scala.collection.mutable.ListBuffer.empty[ObjectNode]
      objectsAt(n, unwrap, objs)
      objs.foreach { o =>
        val it = o.fields()
        while (it.hasNext) {
          val e = it.next()
          val path = if (prefix.isEmpty) quoteKey(e.getKey)
                     else prefix + "." + quoteKey(e.getKey)
          keys += path
          if (maxDepth == -1 || depth + 1 < maxDepth) walk(e.getValue, path, depth + 1)
        }
      }
    }
    walk(root, "", 0)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      keys.toArray.map(UTF8String.fromString(_): Any))
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonKeys", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ((graft.functions.JsonKeys) $ref).compute($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): JsonKeys =
    copy(child = newChild)
}

/** BigQuery's STRICT typed JSON accessors — BOOL / INT64 / FLOAT64 /
  * STRING over the engine's string-carried JSON. Unlike the LAX_*
  * family these RAISE when the JSON type does not match (BigQuery's
  * rule); the `safe` forms (SAFE.BOOL etc.) yield NULL instead. SQL
  * NULL input is NULL in both; invalid JSON TEXT follows the same
  * strict/safe split (BigQuery's input is an always-valid JSON value —
  * here the parse is part of the access, stated).
  *
  *  - BOOL: JSON true/false only.
  *  - INT64: a JSON number with no fractional part, inside the INT64
  *    domain (`10.0` → 10, `1e3` → 1000; `1.5` and `1e30` raise).
  *  - FLOAT64: any JSON number; `wideMode = "exact"` (the BigQuery
  *    default) raises when the double round-trip loses the decimal
  *    value (`9007199254740993` raises — its nearest double prints
  *    back `...992`); `"round"` accepts nearest. The round-trip test
  *    is shortest-repr: BigDecimal(Double.toString(d)) == the parsed
  *    decimal, numerically.
  *  - STRING: a JSON string only, unquoted. (BigQuery's separate
  *    STRING(timestamp) formatter is NOT this function — a timestamp
  *    argument fails typed at analysis; use FORMAT_TIMESTAMP.)
  */
case class JsonStrictAccess(child: Expression, kind: String, safe: Boolean,
                            wideMode: String = "exact")
    extends UnaryExpression with ExpectsInputTypes {
  require(Set("BOOL", "INT64", "FLOAT64", "STRING").contains(kind),
    s"unknown JSON accessor kind $kind")
  require(Set("exact", "round").contains(wideMode),
    s"FLOAT64 wide_number_mode must be 'exact' or 'round', got '$wideMode'")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = kind match {
    case "BOOL" => BooleanType
    case "INT64" => LongType
    case "FLOAT64" => DoubleType
    case _ => StringType
  }
  override def nullable: Boolean = true
  private def fail(msg: String): Any =
    if (safe) null
    else throw new IllegalArgumentException(
      s"$kind: $msg (use SAFE.$kind for NULL instead)")
  def compute(j: UTF8String): Any = {
    val n = JsonMut.tryParse(j)
    if (n == null) return fail(s"invalid JSON input: ${j.toString.take(80)}")
    kind match {
      case "BOOL" =>
        if (n.isBoolean) java.lang.Boolean.valueOf(n.booleanValue())
        else fail(s"JSON value is ${JsonMut.typeName(n)}, not boolean")
      case "STRING" =>
        if (n.isTextual) UTF8String.fromString(n.textValue())
        else fail(s"JSON value is ${JsonMut.typeName(n)}, not string")
      // Jackson parses an overflowing exponent ('1e400') to an
      // INFINITE DoubleNode whose decimalValue() throws — guard it
      // before any BigDecimal conversion (SAFE must NULL, strict must
      // raise the TYPED message, never leak a NumberFormatException)
      case "INT64" =>
        if (!n.isNumber) fail(s"JSON value is ${JsonMut.typeName(n)}, not number")
        else if (n.isDouble && java.lang.Double.isInfinite(n.doubleValue()))
          fail("JSON number overflows (infinite double) — not an INT64")
        else {
          val bd = n.decimalValue()
          try java.lang.Long.valueOf(bd.longValueExact())
          catch { case _: ArithmeticException =>
            fail(s"JSON number $bd is not an INT64 (fractional or out of range)") }
        }
      case _ => // FLOAT64
        if (!n.isNumber) fail(s"JSON value is ${JsonMut.typeName(n)}, not number")
        else if (n.isDouble && java.lang.Double.isInfinite(n.doubleValue())) {
          // the text overflowed the double range: 'round' takes the
          // IEEE overflow (±Infinity, what strtod rounding gives);
          // 'exact' raises — no finite double round-trips the text
          if (wideMode == "round") java.lang.Double.valueOf(n.doubleValue())
          else fail("JSON number overflows FLOAT64 " +
            "(wide_number_mode => 'round' accepts the IEEE overflow)")
        } else {
          val bd = n.decimalValue()
          val d = bd.doubleValue()
          if (wideMode == "round") java.lang.Double.valueOf(d)
          else if (java.lang.Double.isInfinite(d) ||
            new java.math.BigDecimal(java.lang.Double.toString(d)).compareTo(bd) != 0)
            fail(s"JSON number $bd cannot be converted to FLOAT64 without loss " +
              "(wide_number_mode => 'round' accepts the nearest double)")
          else java.lang.Double.valueOf(d)
        }
    }
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonStrict", this)
    val c = child.genCode(ctx)
    val tmp = ctx.freshName("jsv")
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)
    val dflt = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.defaultValue(dataType)
    val unbox = kind match {
      case "BOOL" => s"((java.lang.Boolean) $tmp).booleanValue()"
      case "INT64" => s"((java.lang.Long) $tmp).longValue()"
      case "FLOAT64" => s"((java.lang.Double) $tmp).doubleValue()"
      case _ => s"(UTF8String) $tmp"
    }
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = $dflt;
      if (!${c.isNull}) {
        Object $tmp = ((graft.functions.JsonStrictAccess) $ref).compute(${c.value});
        if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = $unbox; }
      }""")
  }
  override protected def withNewChildInternal(newChild: Expression): JsonStrictAccess =
    copy(child = newChild)
}

/** TO_JSON_STRING's `pretty_print` rendering — BigQuery's exact
  * layout (2-space indent, `"key": value` with no space before the
  * colon, every array element and object member on its own line,
  * empty containers staying `{}` / `[]`), hand-walked over the
  * Jackson tree so the bytes are pinned here rather than by a
  * library's printer defaults. Invalid or NULL input is NULL.
  */
case class JsonPretty(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  private def render(n: JsonNode, indent: Int, sb: java.lang.StringBuilder): Unit = {
    val pad = "  " * indent
    val padIn = "  " * (indent + 1)
    n match {
      case o: ObjectNode if o.size() == 0 => sb.append("{}")
      case o: ObjectNode =>
        sb.append("{\n")
        val it = o.fields()
        var first = true
        while (it.hasNext) {
          val e = it.next()
          if (!first) sb.append(",\n")
          first = false
          sb.append(padIn)
          sb.append(JsonMut.out(
            com.fasterxml.jackson.databind.node.TextNode.valueOf(e.getKey)).toString)
          sb.append(": ")
          render(e.getValue, indent + 1, sb)
        }
        sb.append("\n").append(pad).append("}")
      case a: ArrayNode if a.size() == 0 => sb.append("[]")
      case a: ArrayNode =>
        sb.append("[\n")
        var i = 0
        while (i < a.size()) {
          if (i > 0) sb.append(",\n")
          sb.append(padIn)
          render(a.get(i), indent + 1, sb)
          i += 1
        }
        sb.append("\n").append(pad).append("]")
      case other => sb.append(JsonMut.out(other).toString)
    }
  }
  def compute(j: UTF8String): UTF8String = {
    val root = JsonMut.tryParse(j)
    if (root == null) null
    else {
      val sb = new java.lang.StringBuilder
      render(root, 0, sb)
      UTF8String.fromString(sb.toString)
    }
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonPretty", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ((graft.functions.JsonPretty) $ref).compute($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): JsonPretty =
    copy(child = newChild)
}

/** JSON_TYPE(json) — 'object'/'array'/'string'/'number'/'boolean'/
  * 'null'; invalid or NULL input is NULL.
  */
case class JsonTypeOf(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  def compute(j: UTF8String): UTF8String = {
    val root = JsonMut.tryParse(j)
    if (root == null) null else UTF8String.fromString(JsonMut.typeName(root))
  }
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonTypeOf", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ((graft.functions.JsonTypeOf) $ref).compute($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): JsonTypeOf =
    copy(child = newChild)
}
