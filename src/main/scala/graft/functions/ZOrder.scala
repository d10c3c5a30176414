package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 2-D Morton (z-order) key: interleave the low 16 bits of two longs
  * into one 32-bit-wide key whose sort order follows the space-filling
  * z-curve. Sorting / range-partitioning a table by this key clusters
  * rows that are close in BOTH dimensions into the same files, so
  * min/max (row-group / file-footer) statistics prune multi-dimension
  * range probes — the data-layout lever behind "scan 3 files, not
  * 300" at 100 TB. The q57 audit row measures exactly that effect.
  *
  * Bit spreading is the classic mask-shift ladder (public-domain
  * "Interleave bits by Binary Magic Numbers" bit hack), fully codegen:
  * no branches, no allocation, stays inside whole-stage codegen.
  */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_zorder"
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(l: Any, r: Any): Any =
    ZInterleave.eval(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      def ladder(v: String): String = ZInterleave.Steps
        .map { case (s, m) => s"$v = ($v | ($v << $s)) & ${m}L;" }
        .mkString("\n")
      s"""
         |long $sa = $a & ${ZInterleave.Mask}L;
         |long $sb = $b & ${ZInterleave.Mask}L;
         |${ladder(sa)}
         |${ladder(sb)}
         |${ev.value} = $sa | ($sb << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave =
    copy(left = newLeft, right = newRight)
}

object ZInterleave {

  /** Bits kept per dimension. 16 keeps the spread ≤ bit 31 and the
    * key ≤ bit 32, so the oracle's BIGINT `<<` replay can never touch
    * the sign bit (DuckDB and Java then agree bit-for-bit). 65 536
    * buckets per dimension is far below file granularity anyway —
    * rank/bucket wider domains onto the grid first. */
  val Bits: Int = 16
  val Mask: Long = (1L << Bits) - 1

  /** The spread ladder (shift, mask): 16 data bits → even bit
    * positions of a 32-bit lane. Single source of truth for the
    * interpreted eval, the generated Java, and the oracle SQL. */
  val Steps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  def spread(x: Long): Long =
    Steps.foldLeft(x & Mask) { case (v, (s, m)) => (v | (v << s)) & m }

  def eval(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** DuckDB CTE chain replaying the ladder: starting from relation
    * `from` holding columns `sa`/`sb` (already masked to [[Bits]]
    * bits), emits `<prefix>1 … <prefix>N` with the final relation
    * carrying the spread `sa`/`sb`; `carry` columns pass through. */
  def spreadCtesSql(from: String, prefix: String, carry: String): String = {
    val stages = Steps.zipWithIndex.map { case ((s, m), i) =>
      val src = if (i == 0) from else s"$prefix$i"
      s"""$prefix${i + 1} AS (
         |  SELECT $carry,
         |         (sa | (sa << $s)) & $m AS sa,
         |         (sb | (sb << $s)) & $m AS sb
         |  FROM $src)""".stripMargin
    }
    stages.mkString(",\n")
  }

  /** Name of the last CTE [[spreadCtesSql]] emits. */
  def spreadLastCte(prefix: String): String = s"$prefix${Steps.size}"
}
