package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def reference(xs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    xs.sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      .take(k)

  test("insert/merge equal the sort-based reference on random data, " +
       "any arrival order, with ties") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(200)
      val k = 1 + rnd.nextInt(8)
      // small score range forces ties; ids unique
      val xs = (1 to n).map(i => (rnd.nextInt(10).toLong, i.toLong))
      val viaInsert = xs.foldLeft(Array.empty[TopK.Entry])(
        (b, e) => TopK.insert(b, k, e)).toSeq
      assert(viaInsert === reference(xs, k), s"trial $trial insert")
      // arbitrary split points: merge of partial heaps == whole
      val split = rnd.nextInt(n + 1)
      val (l, r) = xs.splitAt(split)
      val hl = l.foldLeft(Array.empty[TopK.Entry])((b, e) => TopK.insert(b, k, e))
      val hr = r.foldLeft(Array.empty[TopK.Entry])((b, e) => TopK.insert(b, k, e))
      val merged = hr.foldLeft(hl)((b, e) => TopK.insert(b, k, e)).toSeq
      assert(merged === reference(xs, k), s"trial $trial merge")
    }
  }

  test("the udaf matches a window top-k on a grouped frame and its " +
       "plan carries no Window operator") {
    val rnd = new scala.util.Random(4)
    val rows = (1 to 5000).map(i => (i % 7, rnd.nextInt(100).toLong, i.toLong))
    val df = rows.toDF("g", "score", "id").repartition(8)
    val tk = TopK.topKUdaf(4)
    val got = df.groupBy("g").agg(tk(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), col("e._1").as("score"), col("e._2").as("id"))
      .as[(Int, Long, Long)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (g, xs) =>
      reference(xs.map(x => (x._2, x._3)), 4).map(e => (g, e._1, e._2))
    }.toSet
    assert(got === want)
    val plan = df.groupBy("g").agg(tk(col("score"), col("id")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"top-k must not window-sort:\n$plan")
  }
}
