package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Static helpers called from both interpreted eval and generated code
  * (kept in companion-less objects so Scala emits static forwarders the
  * Janino-generated Java can call directly). */
object GeoWkb {
  /** 21-byte little-endian WKB Point (byte order 01, type 1, x, y) —
    * the GeoParquet-compatible encoding of the reference's shapely
    * Point(lon, lat) (gtfs_rt_assets.py:122-128, SURVEY.md §7.3). */
  def pointWkb(lon: Double, lat: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(1).putDouble(lon).putDouble(lat)
    bb.array()
  }
  private def coord(wkb: Array[Byte], offset: Int): Double = {
    require(wkb.length >= 21, s"WKB point must be 21 bytes, got ${wkb.length}")
    val order =
      if (wkb(0) == 1.toByte) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    ByteBuffer.wrap(wkb).order(order).getDouble(offset)
  }
  def readX(wkb: Array[Byte]): Double = coord(wkb, 5)
  def readY(wkb: Array[Byte]): Double = coord(wkb, 13)
}

object VectorOps {
  /** Cosine similarity between two float vectors, accumulating in
    * double — identical math to the higher-order-function formulation
    * but one tight loop, no per-element lambda dispatch. */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Dot product of two float vectors accumulated in double — the
    * norm-factored hot loop for exact all-pairs cosine. Per-pair work
    * drops from 3 multiply-adds per element (dot + both norms, what
    * [[cosineFloat]] does) to 1 when the per-side norms are
    * precomputed ONCE per vector with [[normFloat]]:
    * `dot/(norm(a)*norm(b))` runs the exact same FP operation
    * sequence as cosineFloat, so the factorization is bit-identical
    * (SimilaritySpec proves it on the harness corpus).
    *
    * EQUAL-LENGTH PRECONDITION (ADVICE r08): the bit-identity claim
    * holds only for equal-length vectors. cosineFloat truncates BOTH
    * norm accumulations to min(|a|,|b|), while [[normFloat]] sums the
    * FULL vector — on mixed-dimension inputs the two paths diverge
    * silently. Every caller in this repo feeds fixed-dimension
    * embedding columns; a caller with ragged vectors must truncate
    * them first (or use cosineFloat directly). */
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  /** sqrt of the left-to-right double sum of squares over the FULL
    * vector — cosineFloat's per-side norm, factored out so an
    * n²/2-pair self-join computes it n times instead of n². Matches
    * cosineFloat's norm only for equal-length pairs (see [[dotFloat]]'s
    * equal-length precondition). */
  def normFloat(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  /** Squared L2 distance between two float vectors, as the EXACT
    * left-to-right fold `acc + (x-y)²` in doubles — bit-identical to
    * the `aggregate(zip_with(...))` expression tree it replaces in the
    * PQ family's hot assignment path (same FP operation sequence), and
    * to DuckDB's list_reduce twin. A tight loop instead of per-row
    * higher-order-function dispatch: the 256-codebook Lloyd assignment
    * evaluates this ~corpus × K times per round. */
  def l2SqFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  /** Cosine similarity between two int8-quantized code vectors
    * (array<long>): per-vector symmetric scales cancel, so the whole
    * computation is EXACT integer arithmetic until one final double
    * division — order-independent, bit-reproducible, and ~4x less
    * memory traffic than float vectors. Codes are |c| <= 127 so a
    * 64-dim dot fits a long with 2^40 headroom. */
  def cosineQuantized(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      val y = b.getLong(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }
}

/** Static helper for the MinHash hot loop (Dedup.minhashWide): all 16
  * md5-slice signature components of one shingle in a single call —
  * exactly min-compatible with the SQL formulation
  * `substr(md5(a || ':' || sh), 8b+1, 8)` for component j = 4a+b
  * (n03/n17's DuckDB oracles pin the bytes). One pass = 4 digests and
  * 16 small byte arrays; the expression-tree formulation pays 4
  * UTF8String concats + 4 hex-string materializations + 16 substrings
  * per shingle and leans on codegen subexpression elimination to avoid
  * recomputing digests. */
object HashOps {
  private val hexDigits = "0123456789abcdef".getBytes("ASCII")
  def md5Slices(sh: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val body = sh.getBytes
    val out = new Array[AnyRef](16)
    // one provider lookup per call, not per digest — digest() resets
    // the instance, so it can be reused across the 4 seed groups
    val md = java.security.MessageDigest.getInstance("MD5")
    var a = 0
    while (a < 4) {
      md.update(('0' + a).toByte)
      md.update(':'.toByte)
      md.update(body)
      val dig = md.digest()
      var b = 0
      while (b < 4) {
        // hex of digest bytes [4b, 4b+4) = hex chars [8b, 8b+8)
        val slice = new Array[Byte](8)
        var i = 0
        while (i < 4) {
          val v = dig(4 * b + i) & 0xff
          slice(2 * i) = hexDigits(v >>> 4)
          slice(2 * i + 1) = hexDigits(v & 0xf)
          i += 1
        }
        out(4 * a + b) = org.apache.spark.unsafe.types.UTF8String.fromBytes(slice)
        b += 1
      }
      a += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object CharOps {
  /** Sum of Unicode code points of a string — the array-free twin of
    * `list_sum(list_transform(generate_series(1, length(s)), i ->
    * unicode(substr(s, i, 1))))`: one tight loop over the chars, no
    * per-character boxed array (the n61 phash mean needs exactly this;
    * the transform(split(s,''), ...) formulation materialized an
    * O(len) object array per row — a GC storm at 100 TB media scale). */
  def charSum(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var sum = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      sum += cp
      i += Character.charCount(cp)
    }
    sum
  }
}

/** char_sum(s) → sum of the string's Unicode code points (long). */
case class CharSum(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "char_sum"
  override protected def nullSafeEval(s: Any): Any =
    CharOps.charSum(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharOps.charSum($c)")
  override protected def withNewChildInternal(c: Expression): CharSum = copy(c)
}

/** md5_slices(sh) → array<string> of the 16 MinHash components. */
case class Md5Slices(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "md5_slices"
  override protected def nullSafeEval(s: Any): Any =
    HashOps.md5Slices(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.md5Slices($c)")
  override protected def withNewChildInternal(c: Expression): Md5Slices = copy(c)
}

/** st_point(lon, lat) → WKB binary. Codegen emits a single static
  * call — stays inside whole-stage codegen, no fallback path. */
case class StPoint(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_point"
  override protected def nullSafeEval(lon: Any, lat: Any): Any =
    GeoWkb.pointWkb(lon.asInstanceOf[Double], lat.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.GeoWkb.pointWkb($l, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StPoint =
    copy(left = newLeft, right = newRight)
}

/** st_x(wkb) / st_y(wkb) → coordinate doubles. */
case class StX(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_x"
  override protected def nullSafeEval(wkb: Any): Any =
    GeoWkb.readX(wkb.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoWkb.readX($c)")
  override protected def withNewChildInternal(c: Expression): StX = copy(c)
}

case class StY(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_y"
  override protected def nullSafeEval(wkb: Any): Any =
    GeoWkb.readY(wkb.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GeoWkb.readY($c)")
  override protected def withNewChildInternal(c: Expression): StY = copy(c)
}

/** cosine_sim(a, b) over array<float> — the bench-path alternative to
  * the aggregate/zip_with fold (SURVEY.md §7.3): one codegen'd static
  * call per row instead of 64 lambda dispatches. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps.cosineFloat($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** dot_float(a, b) over array<float> — the norm-factored cosine's
  * per-pair term (see VectorOps.dotFloat). */
case class DotFloat(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_float"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps.dotFloat($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFloat =
    copy(left = newLeft, right = newRight)
}

/** norm_float(a) → the vector's L2 norm (see VectorOps.normFloat). */
case class NormFloat(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm_float"
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.normFloat(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.normFloat($a)")
  override protected def withNewChildInternal(c: Expression): NormFloat = copy(c)
}

/** l2_sq(a, b) → squared L2 distance between two array<float>
  * vectors, the exact left-to-right double fold (see
  * VectorOps.l2SqFloat). */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.l2SqFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps.l2SqFloat($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

/** quantized_cos(a, b) over array<long> int8 codes — exact integer
  * dot/norms, one double division at the end (see
  * VectorOps.cosineQuantized). */
case class QuantizedCos(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantized_cos"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineQuantized(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps.cosineQuantized($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCos =
    copy(left = newLeft, right = newRight)
}

/** Column-API + SQL registration for the custom expressions. */
object GraftFunctions {
  def st_point(lon: Column, lat: Column): Column =
    ColumnBridge.column(StPoint(ColumnBridge.expression(lon), ColumnBridge.expression(lat)))
  def st_x(wkb: Column): Column = ColumnBridge.column(StX(ColumnBridge.expression(wkb)))
  def st_y(wkb: Column): Column = ColumnBridge.column(StY(ColumnBridge.expression(wkb)))
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2_sq(a: Column, b: Column): Column =
    ColumnBridge.column(L2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def dot_float(a: Column, b: Column): Column =
    ColumnBridge.column(DotFloat(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def norm_float(a: Column): Column =
    ColumnBridge.column(NormFloat(ColumnBridge.expression(a)))
  def quantized_cos(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedCos(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def md5_slices(s: Column): Column =
    ColumnBridge.column(Md5Slices(ColumnBridge.expression(s)))
  def char_sum(s: Column): Column =
    ColumnBridge.column(CharSum(ColumnBridge.expression(s)))
  def ppm_phash(media: Column): Column = MediaFunctions.ppm_phash(media)
  def ppm_valid(media: Column): Column = MediaFunctions.ppm_valid(media)

  /** Spark's own runtime-filter membership test, exposed for explicit
    * Bloom prefilters: `bloom` must be a CONSTANT binary column (a
    * serialized `org.apache.spark.util.sketch.BloomFilter` literal —
    * the expression rejects non-foldable filter sides by design) and
    * `h` the xxhash64 of the probed value, matching the long-hash the
    * filter was built over. */
  def might_contain(bloom: Column, h: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.expression(bloom), ColumnBridge.expression(h)))

  /** Register for SQL use (st_point / st_x / st_y / cosine_sim). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("st_point", es => StPoint(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("st_x", es => StX(es.head), "built-in")
    reg.createOrReplaceTempFunction("st_y", es => StY(es.head), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("quantized_cos", es => QuantizedCos(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_sq", es => L2Sq(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("md5_slices", es => Md5Slices(es.head), "built-in")
    reg.createOrReplaceTempFunction("char_sum", es => CharSum(es.head), "built-in")
    reg.createOrReplaceTempFunction("ppm_phash", es => PpmPhash(es.head), "built-in")
    reg.createOrReplaceTempFunction("ppm_valid", es => PpmValid(es.head), "built-in")
  }
}
