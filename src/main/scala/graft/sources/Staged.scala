package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Helpers for scraped/staged flat files (SURVEY §2.1 S2/S5): the
  * reference's HTTP extracts arrive with junk header lines
  * (`read_csv(skip = 2)`) and footer rows
  * (`slice(-c((nrow(.)-2):nrow(.)))`).
  *
  * These are DIMENSION-scale inputs (a few thousand rows staged from
  * an API): both helpers deliberately collapse to one partition
  * because "first/last k lines of the file" is only meaningful under
  * file order. Never point them at fact-scale data — facts come in as
  * parquet and are trimmed relationally.
  */
object Staged {

  /** `read_csv(path, skip = k)`: drop the first k physical lines, then
    * parse CSV with the given schema (header line expected after the
    * skip; null token "NA" like readr).
    */
  def readCsvSkip(spark: SparkSession, path: String, skip: Int,
                  schema: StructType, nullValue: String = "NA"): DataFrame = {
    val lines = spark.read.textFile(path)
      .coalesce(1)
      .mapPartitions(_.drop(skip))(org.apache.spark.sql.Encoders.STRING)
    spark.read.schema(schema)
      .option("header", "true")
      .option("nullValue", nullValue)
      .csv(lines)
  }

  /** R `slice(-c((nrow(.)-k+1):nrow(.)))`: drop the last k rows of a
    * staged frame (scraped-CSV footers).
    *
    * Single pass over ONE partition with a k-row sliding buffer — no
    * separate count job, no count()/limit() order-consistency
    * assumption across jobs, no 2^31 row-count cast. The coalesce(1)
    * pins "last k" to the file order these staged inputs carry.
    */
  def dropTrailingRows(df: DataFrame, k: Int): DataFrame = {
    require(k >= 0, s"dropTrailingRows: k must be >= 0, got $k")
    df.coalesce(1).mapPartitions { it =>
      val buf = scala.collection.mutable.Queue.empty[org.apache.spark.sql.Row]
      it.flatMap { r =>
        buf.enqueue(r)
        if (buf.size > k) Iterator.single(buf.dequeue()) else Iterator.empty
      }
    }(org.apache.spark.sql.Encoders.row(df.schema))
  }
}
