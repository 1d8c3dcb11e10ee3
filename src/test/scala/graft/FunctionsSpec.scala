package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorExpressions.vectorDot

class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  private def df(rows: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])]) = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
    val list = new java.util.ArrayList[Row]()
    rows.foreach { case (a, b) => list.add(Row(a, b)) }
    spark.createDataFrame(list, schema)
  }

  test("vector_dot matches the unrolled element_at sum bit-for-bit") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding").as("a"),
        reverse(col("embedding")).as("b"))
    val unrolled = (1 to 64).map(i =>
      element_at(col("a"), i).cast(DoubleType) *
        element_at(col("b"), i).cast(DoubleType)).reduce(_ + _)
    val diff = emb.select(vectorDot(col("a"), col("b")).as("fast"),
      unrolled.as("slow"))
      .where(col("fast") =!= col("slow")) // bitwise: any ULP drift fails
      .count()
    assert(diff == 0)
  }

  test("vector_dot null semantics: length mismatch and null elements") {
    val rows = df(Seq(
      (Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f)), // 11.0
      (Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f)), // len mismatch
      (Seq[java.lang.Float](1f, null), Seq[java.lang.Float](3f, 4f)), // null elem
      (null, Seq[java.lang.Float](3f, 4f)))) // null array
    val got = rows.select(vectorDot(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(11.0), None, None, None))
  }

  test("vector_dot accepts double arrays (centroid side)") {
    val d = spark.range(1).select(
      vectorDot(
        array(lit(1.5), lit(2.0)).cast(ArrayType(DoubleType)),
        array(lit(2.0), lit(3.0)).cast(ArrayType(DoubleType))).as("d"))
      .head().getDouble(0)
    assert(d == 9.0)
  }

  test("pq_adc matches the unrolled element_at LUT sum bit-for-bit") {
    import graft.functions.VectorExpressions.pqAdc
    // 4 subspaces x 4 codewords, LUT values with non-trivial mantissas
    val k = 4
    val lut = (0 until 16).map(i => math.Pi * (i + 1) / 7.0)
    val codesDf = spark.range(256).select(
      array((0 until 4).map(m =>
        pmod(col("id") * (m + 3), lit(k)).cast(ByteType)): _*).as("codes"))
    val unrolled = (0 until 4).map(m =>
      element_at(typedLit(lut.slice(m * k, m * k + k)),
        element_at(col("codes"), m + 1).cast(IntegerType) + 1))
      .reduce(_ + _)
    val diff = codesDf.select(
      pqAdc(col("codes"), typedLit(lut), k).as("fast"),
      unrolled.as("slow"))
      .where(col("fast") =!= col("slow")) // bitwise: any ULP drift fails
      .count()
    assert(diff == 0)
  }

  test("pq_adc null semantics and the unsigned one-byte code regime") {
    import graft.functions.VectorExpressions.pqAdc
    // k=256: code byte -1 reads as 255 (signed storage, unsigned codes)
    val k = 256
    val lut = (0 until 256).map(_.toDouble)
    val v = spark.range(1).select(pqAdc(
      array(lit(-1).cast(ByteType)), typedLit(lut), k).as("v"))
      .head.getDouble(0)
    assert(v == 255.0, s"signed byte -1 must read as code 255, got $v")
    // LUT length mismatch -> null; code outside k -> null
    val mism = spark.range(1).select(pqAdc(
      array(lit(0).cast(ByteType), lit(1).cast(ByteType)),
      typedLit(lut), k).as("v")).head
    assert(mism.isNullAt(0), "2 codes x k=256 needs a 512-slot LUT")
    val oob = spark.range(1).select(pqAdc(
      array(lit(9).cast(ByteType)), typedLit(Seq(1.0, 2.0)), 2).as("v"))
      .head
    assert(oob.isNullAt(0), "code 9 with k=2 must be null")
  }
}
