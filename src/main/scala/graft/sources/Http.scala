package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Driver-side HTTP staging for API extracts (SURVEY §2.1 S4; the
  * reference's `read_usis` reads an OData CSV export straight off the
  * wire and `get_unsd_gdp_data` GETs files to a tempfile —
  * `gpd_etl_pipeline.R:41-60`).
  *
  * Design: the fetch happens ONCE on the driver into a local staging
  * file; only the parse is Spark. These are dimension-scale API
  * responses (thousands of rows) — pulling them through a distributed
  * source would add nothing but failure modes, and re-fetching from
  * every executor would hammer the upstream API. 100 TB inputs arrive
  * as parquet/object-store paths, never as HTTP GETs.
  */
object Http {

  /** The reference's USIS OData URL scheme (`gpd_etl_pipeline.R:42-47`):
    * `Series{s}Source{src}Measure{m}FrequencyA/GetLastVersion()/Data`
    * with CSV format, appended to the service base.
    */
  def usisUrl(base: String, series: String, source: String,
              measure: String): String =
    s"${base.stripSuffix("/")}/Series${series}Source${source}" +
      s"Measure${measure}FrequencyA/GetLastVersion()/Data?" + "$format=csv"

  /** `httr::GET(url, write_disk(tempfile))` equivalent: stream the
    * response body to a temp staging file and return its path.
    * Redirects are followed (NORMAL: http→https upgrades allowed,
    * https→http downgrades refused, like httr). Transient failures —
    * 5xx, 429, connect/read errors — are retried with exponential
    * backoff; 4xx client errors fail immediately (a wrong URL won't
    * get righter, and retrying it hammers the upstream API). Throws
    * after the last attempt on any non-2xx (the reference would
    * silently parse an HTML error page; we fail fast).
    */
  def fetchToFile(url: String, suffix: String = ".csv",
                  timeout: Duration = Duration.ofSeconds(60),
                  retries: Int = 2,
                  backoffMs: Long = 200): Path = {
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .connectTimeout(timeout)
      .build()
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(timeout).GET().build()
    def attempt(left: Int, wait: Long): Path = {
      val tmp = Files.createTempFile("graft-staged-", suffix)
      tmp.toFile.deleteOnExit()
      val status =
        try Right(client.send(req, HttpResponse.BodyHandlers.ofFile(tmp))
          .statusCode())
        catch { case e: java.io.IOException => Left(e) }
      status match {
        case Right(code) if code / 100 == 2 => tmp
        case other =>
          Files.deleteIfExists(tmp)
          val retryable = other match {
            case Right(code) => code / 100 == 5 || code == 429
            case Left(_) => true // connect/read failure
          }
          if (retryable && left > 0) {
            Thread.sleep(wait)
            attempt(left - 1, wait * 2)
          } else other match {
            case Right(code) => throw new java.io.IOException(
              s"GET $url returned HTTP $code" +
                (if (retryable) s" after ${retries + 1} attempts" else ""))
            case Left(e) => throw new java.io.IOException(
              s"GET $url failed after ${retries + 1} attempts", e)
          }
      }
    }
    attempt(retries, backoffMs)
  }

  /** Full staged-CSV extract path: fetch → staging file →
    * [[Staged.readCsvSkip]] (junk-header skip + explicit schema + R's
    * "NA" null token). skip=0 degenerates to a plain schema'd read, so
    * this one entry point covers both the USIS CSV exports and the
    * scraped skip-2 shapes.
    */
  def readCsvUrl(spark: SparkSession, url: String, schema: StructType,
                 skip: Int = 0, nullValue: String = "NA",
                 timeout: Duration = Duration.ofSeconds(60)): DataFrame = {
    val staged = fetchToFile(url, ".csv", timeout)
    Staged.readCsvSkip(spark, staged.toString, skip, schema, nullValue)
  }

  /** The reference's `get_unsd_gdp_data` shape
    * (`gpd_etl_pipeline.R:53-61`): GET an .xlsx to a staging file, then
    * `read_excel(skip = n)` — here the native [[Xlsx]] reader.
    */
  def readXlsxUrl(spark: SparkSession, url: String, skip: Int = 0,
                  sheet: Int = 0,
                  timeout: Duration = Duration.ofSeconds(60)): DataFrame = {
    val staged = fetchToFile(url, ".xlsx", timeout)
    Xlsx.read(spark, staged.toString, skip, sheet)
  }
}
