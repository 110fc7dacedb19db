package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String): String = s"/root/testdata/$dir"

  /** In-repo large-SF dirs (testdata-sf1 etc.), resolved against the
    * checkout root (= sbt's working dir) rather than a hardcoded
    * absolute path, so the suite survives a different checkout
    * location (advisor r14). These dirs are gitignored and the box is
    * re-provisioned every round, so a suite run on a fresh checkout
    * would red on a missing dir unless someone remembered to run
    * GenSf first — instead, GENERATE on demand: GenSf is a pure
    * function of xxhash64(id, seed) (byte-stable across runs and
    * partitionings), so a lazily generated dir is identical to a
    * pre-built one. Only the sf1 multiplier is auto-built (the one
    * the suites reference); ~1-2 min one-time cost on local[4].
    */
  def sfRepo(dir: String): String = {
    val f = new java.io.File(sys.props("user.dir"), dir)
    if (!f.exists() && dir == "testdata-sf1")
      SparkSpec.ensureSf1(spark, f)
    f.getAbsolutePath
  }
}

object SparkSpec {
  /** Build a missing testdata-sf1 in place (generation into a tmp dir
    * + atomic rename, so a concurrently-running suite never reads a
    * half-written dir). Synchronized: suites share one JVM.
    */
  def ensureSf1(spark: SparkSession, target: java.io.File): Unit =
    synchronized {
      if (target.exists()) return
      System.err.println(s"[spec] ${target.getName} missing - " +
        "generating via GenSf (deterministic; one-time ~1-2 min)")
      val tmp = new java.io.File(target.getParentFile,
        target.getName + ".tmp." + ProcessHandle.current().pid())
      GenSf.generate(spark, tmp.getAbsolutePath, mult = 10)
      if (!tmp.renameTo(target) && !target.exists())
        throw new IllegalStateException(
          s"could not publish generated $target")
    }

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
