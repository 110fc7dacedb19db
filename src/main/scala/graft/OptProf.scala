package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc A/B profiler for round-20 optimization experiments (dev
  * tool, same role as Prof.scala): times alternative formulations of
  * a pipeline fragment inside ONE JVM so JIT/host drift cancels.
  * Usage: tools/bench.sh graft.OptProf [sfDir] [experiment]
  */
object OptProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val exp = if (args.length > 1) args(1) else "edges"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[optprof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    // mirror Bench.runBlock: clear state FIRST, then construct + count
    // inside the timed region (construction may run eager checkpoints)
    def drain(mk: => DataFrame): Long = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      mk.queryExecution.toRdd.count()
    }

    val t = (n: String) => Tables.t(spark, sfDir, n)

    exp match {
      case "edges" =>
        // A: current prologue — distinct (ok,pk) -> self-join -> orientById
        def edgesSelfJoin(): DataFrame = {
          val pp = t("lineitem")
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
            .distinct()
          val raw = pp.as("a")
            .join(pp.as("b"),
              col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
            .select(col("a.pk").as("u"), col("b.pk").as("v"))
          graft.operators.Triangles.orientById(raw)
        }
        // B: group-to-array + row-local pair generation (one shuffle
        // for the groupBy, pairs never exchanged pre-distinct)
        def edgesArray(): DataFrame = {
          val perOrder = t("lineitem")
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
            .groupBy("ok")
            .agg(sort_array(collect_set(col("pk"))).as("ps"))
          val pairs = perOrder.select(explode(expr(
            """flatten(transform(ps, (x, i) ->
              |  transform(slice(ps, i + 2, size(ps) - i - 1),
              |            y -> struct(x AS u, y AS v))))""".stripMargin))
            .as("e"))
            .select(col("e.u").as("u"), col("e.v").as("v"))
          pairs.distinct()
        }
        for (r <- 1 to 3) {
          val a = time(s"A self-join run$r")(drain(edgesSelfJoin()))
          val b = time(s"B array-pairs run$r")(drain(edgesArray()))
          println(s"[optprof] rows A=$a B=$b")
        }

      case "gcc" =>
        // full clustering-coeff decomposition: edge build vs triangle
        // credit vs final assembly
        val fn = SparkEntry.queries("graph_clustering_coeff")
        for (r <- 1 to 3) time(s"gcc full run$r")(drain(fn(spark, sfDir)))

      case "gccdecomp" =>
        import graft.operators.Triangles
        for (r <- 1 to 3) {
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          val pp = t("lineitem")
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
            .distinct()
          val raw = pp.as("a")
            .join(pp.as("b"),
              col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
            .select(col("a.pk").as("u"), col("b.pk").as("v"))
          val canon = time(s"r$r canon ckpt") {
            val c = Triangles.orientById(raw).localCheckpoint()
            c.count(); c
          }
          val deg = time(s"r$r degrees ckpt") {
            val dg = Triangles.degrees(canon).localCheckpoint()
            dg.count(); dg
          }
          val oriented = time(s"r$r orient") {
            val o = Triangles.orientByDegreeCanonical(canon, deg)
            o.queryExecution.toRdd.count(); o
          }
          val tri = time(s"r$r perNodeBatched") {
            val x = Triangles.perNodeAdjacencyBatched(oriented)
            x.queryExecution.toRdd.count(); x
          }
          time(s"r$r final assemble") {
            (deg.where(col("deg") >= 2)
              .join(tri, Seq("node"), "left")
              .select(col("node"), col("deg"),
                coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"),
                ((coalesce(col("tri_cnt"), lit(0L)) * 2).cast("double")
                  / (col("deg") * (col("deg") - 1)).cast("double")).as("cc"))
              .orderBy("node")).queryExecution.toRdd.count()
          }
        }

      case "parts" =>
        import graft.operators.{CoPurchase, Triangles}
        val pp = t("lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val rawA = pp.as("a")
          .join(pp.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v"))
        val rawB = CoPurchase.pairs(t("lineitem"),
          col("l_orderkey"), col("l_partkey"))
        val ca = Triangles.orientById(rawA).localCheckpoint()
        val cb = Triangles.orientById(rawB).localCheckpoint()
        println(s"[optprof] canon parts A=${ca.rdd.getNumPartitions} " +
          s"B=${cb.rdd.getNumPartitions} rowsA=${ca.count()} rowsB=${cb.count()}")

      case "gccab" =>
        import graft.operators.{CoPurchase, Triangles}
        def gcc(raw: DataFrame): DataFrame = {
          val canon = Triangles.orientById(raw).localCheckpoint()
          val deg = Triangles.degrees(canon).localCheckpoint()
          val tri = Triangles.perNodeAdjacencyBatched(
            Triangles.orientByDegreeCanonical(canon, deg))
          deg.where(col("deg") >= 2)
            .join(tri, Seq("node"), "left")
            .select(col("node"), col("deg"),
              coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"),
              ((coalesce(col("tri_cnt"), lit(0L)) * 2).cast("double")
                / (col("deg") * (col("deg") - 1)).cast("double")).as("cc"))
            .orderBy("node")
        }
        def rawA(): DataFrame = {
          val pp = t("lineitem")
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
            .distinct()
          pp.as("a")
            .join(pp.as("b"),
              col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
            .select(col("a.pk").as("u"), col("b.pk").as("v"))
        }
        def rawB(): DataFrame = CoPurchase.pairs(t("lineitem"),
          col("l_orderkey"), col("l_partkey"))
        def benchOnce(label: String)(mk: => DataFrame): Unit = {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          time(label)(mk.queryExecution.toRdd.count())
        }
        for (r <- 1 to 4) {
          benchOnce(s"gcc A(selfjoin) run$r")(gcc(rawA()))
          benchOnce(s"gcc B(arraypair) run$r")(gcc(rawB()))
        }

      case "shufflebytes" =>
        import graft.operators.{CoPurchase, Triangles}
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
        def shuffles(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
          case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
          case q: QueryStageExec => shuffles(q.plan)
          case s: ShuffleExchangeLike =>
            Seq(s) ++ s.children.flatMap(shuffles)
          case other => other.children.flatMap(shuffles) ++
            other.subqueries.flatMap(shuffles)
        }
        def report(label: String, df: DataFrame): Unit = {
          val qe = df.queryExecution
          qe.toRdd.count()
          val ss = shuffles(qe.executedPlan)
          val recs = ss.map(s => s.metrics.get("shuffleRecordsWritten")
            .map(_.value).getOrElse(-1L))
          val bytes = ss.map(s => s.metrics.get("shuffleBytesWritten")
            .map(_.value).getOrElse(
              s.metrics.get("dataSize").map(_.value).getOrElse(-1L)))
          println(s"[optprof] $label shuffles=${ss.size} " +
            s"records=${recs.mkString(",")} bytes=${bytes.mkString(",")} " +
            s"recTotal=${recs.filter(_ > 0).sum} " +
            s"byteTotal=${bytes.filter(_ > 0).sum}")
        }
        val ppS = t("lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val rA = ppS.as("a")
          .join(ppS.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v"))
        report("A edges", Triangles.orientById(rA))
        report("B edges", Triangles.orientById(
          CoPurchase.pairs(t("lineitem"),
            col("l_orderkey"), col("l_partkey"))))

      case "confab" =>
        // within-JVM A/B of a runtime conf over a query subset:
        // args(2) = conf key, args(3) = off/on values "v0|v1",
        // args(4) = comma query list, interleaved 4 rounds, min wins.
        val key = args(2)
        val Array(v0, v1) = args(3).split("\\|")
        val names = args(4).split(",").toSeq
        val mins = collection.mutable.Map[(String, String), Double]()
          .withDefaultValue(Double.MaxValue)
        for (r <- 1 to 4; v <- Seq(v0, v1)) {
          spark.conf.set(key, v)
          for (nm <- names) {
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = false))
            val t0 = System.nanoTime()
            SparkEntry.queries(nm)(spark, sfDir).queryExecution.toRdd.count()
            val dt = (System.nanoTime() - t0) / 1e9
            if (r > 1) // round 1 = warmup
              mins((nm, v)) = math.min(mins((nm, v)), dt)
          }
        }
        for (nm <- names)
          println(f"[optprof] $nm%-32s $v0=${mins((nm, v0))}%6.2f " +
            f"$v1=${mins((nm, v1))}%6.2f")
        println(f"[optprof] TOTAL $v0=${names.map(n => mins((n, v0))).sum}%6.2f " +
          f"$v1=${names.map(n => mins((n, v1))).sum}%6.2f")

      case "pagerank" =>
        val fn = SparkEntry.queries("pagerank_fixed")
        for (r <- 1 to 3) time(s"pagerank_fixed run$r")(drain(fn(spark, sfDir)))

      case other =>
        // any catalog row by name, 3 timed runs
        val fn = SparkEntry.queries(other)
        for (r <- 1 to 3) time(s"$other run$r")(drain(fn(spark, sfDir)))
    }
    spark.stop()
  }
}
