package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TextQueries

class TextSpec extends AnyFunSuite {
  import TestSpark._

  test("hashExpr (lambda text) and hashCol (Column) are value-identical") {
    import spark.implicits._
    val docs = Seq("the quick brown fox", "a", "", "x y", "näïve ünïcode")
      .toDF("s")
    // hashCol path (as shingleHashes uses it, post-explode)
    val viaCol = docs.select(
      (conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
        .cast("long") % 2147483647L).as("h"))
      .collect().map(_.getLong(0))
    // hashExpr path (as in-lambda consumers would evaluate it)
    val viaExpr = docs
      .select(expr(s"transform(array(s), s -> ${TextQueries.hashExpr("s")})")
        .as("hs"))
      .collect().map(_.getSeq[Long](0).head)
    assert(viaCol.toSeq == viaExpr.toSeq)
  }

  test("jaccard plan variants agree (postings vs streamed vs lead)") {
    val p = TextQueries.ngramJaccardPostings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val st = TextQueries.ngramJaccardStreamed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ld = TextQueries.ngramJaccardStreamedLead(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(p.toSeq == st.toSeq)
    assert(p.toSeq == ld.toSeq)
    assert(p.nonEmpty)
  }
}
