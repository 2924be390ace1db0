package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Static media helpers the codegen'd expressions call — one static
  * invocation per row, no virtual dispatch (the CharOps/GeoWkb
  * pattern). */
object MediaOps {
  /** 16-bit WHT perceptual hash of a binary PPM (P6) payload, or −1
    * when the bytes are not a decodable image — the sentinel the
    * expression layer maps to SQL NULL (the hash space is 16 bits, so
    * −1 is unreachable for a real hash). */
  def ppmPhashOrMinusOne(bytes: Array[Byte]): Long =
    graft.operators.Netpbm.decodeP6(bytes).fold(
      _ => -1L,
      img => graft.operators.Netpbm.whtPhash(graft.operators.Netpbm.luma8x8(img)))

  /** O(header) decodability check — see [[graft.operators.Netpbm.headerValid]]. */
  def ppmValid(bytes: Array[Byte]): Boolean =
    graft.operators.Netpbm.headerValid(bytes)
}

/** ppm_phash(media) → the 16-bit Walsh–Hadamard perceptual hash of a
  * binary PPM payload; NULL for undecodable bytes. This puts the
  * decode + downsample + transform + threshold chain INSIDE
  * whole-stage codegen — n61's dedup plan is then scan → project
  * (hash) → 8-byte-key aggregate, with the raster bytes never leaving
  * the scan stage. Malformed media is data, not an error: it hashes
  * to NULL and falls out of the dedup grouping instead of failing the
  * stage (the typed [[graft.operators.Netpbm.decodeP6]] Either API
  * remains the path for callers who want the parse error itself). */
case class PpmPhash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ppm_phash"
  override protected def nullSafeEval(bytes: Any): Any = {
    val r = MediaOps.ppmPhashOrMinusOne(bytes.asInstanceOf[Array[Byte]])
    if (r < 0) null else r
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""long ${ev.value}_r = graft.functions.MediaOps.ppmPhashOrMinusOne($c);
         |if (${ev.value}_r < 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }""".stripMargin)
  override protected def withNewChildInternal(c: Expression): PpmPhash = copy(c)
}

/** ppm_valid(media) → true iff the bytes parse as a decodable P6 —
  * an O(header) predicate (no raster copy, no hash). Plans filter on
  * THIS and project `ppm_phash` on the survivors: filtering on
  * `ppm_phash(media) IS NOT NULL` instead would get pushed through
  * the projection by Catalyst and run the full decode+hash TWICE per
  * row (observed in the st10 plan audit — the filter condition held
  * its own `ppm_phash(media)` copy). */
case class PpmValid(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "ppm_valid"
  override protected def nullSafeEval(bytes: Any): Any =
    MediaOps.ppmValid(bytes.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaOps.ppmValid($c)")
  override protected def withNewChildInternal(c: Expression): PpmValid = copy(c)
}

object MediaFunctions {
  def ppm_phash(media: Column): Column =
    ColumnBridge.column(PpmPhash(ColumnBridge.expression(media)))
  def ppm_valid(media: Column): Column =
    ColumnBridge.column(PpmValid(ColumnBridge.expression(media)))
}
