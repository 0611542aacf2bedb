package graft.ingest

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.WeatherModel

/** Live-mode S1 adapter: per-region HTTP point lookups feeding the
  * existing flatten path.
  *
  * The reference fetches each region sequentially with a 30 s timeout and
  * `raise_for_status` (daily_weather_etl_kenya.py:143-157) under an
  * Airflow retry budget of 2 retries / 5 min (py:52-53). This adapter
  * reproduces that operationally — sequential driver-side loop (15 tiny
  * point lookups; parallelism would be overkill, SURVEY §2.1 S1),
  * per-region error isolation (a failed region is reported and skipped,
  * the batch continues — py:196-204), bounded retries with injectable
  * sleep — and then hands the raw JSON bodies to Spark via
  * `createDataFrame` + `from_json` with the explicit nested schema, where
  * [[WeatherIngest.flatten]] takes over.
  *
  * Config is explicit parameters, never ambient: the reference's
  * `API_KEY`/`WEATHER_API_BASE_URL` exist only in comments (py:13-24) and
  * the file as shipped raises `NameError` — a defect SURVEY §7 says not
  * to port.
  *
  * @param baseUrl      e.g. `https://api.openweathermap.org/data/2.5/weather`
  * @param apiKey       OWM API key (query param `appid`, py:149)
  * @param timeoutMs    connect+read timeout per attempt (py:154: 30 s)
  * @param retries      extra attempts after the first failure (py:52: 2)
  * @param retryDelayMs delay between attempts (py:53: 5 min)
  * @param sleep        injectable for tests — the retry budget is
  *                     asserted without sleeping 10 minutes
  */
final case class FetchConfig(
    baseUrl: String,
    apiKey: String,
    timeoutMs: Int = 30000,
    retries: Int = 2,
    retryDelayMs: Long = 300000L,
    sleep: Long => Unit = Thread.sleep)

object WeatherFetch {

  /** One region's outcome: the raw response body, or the terminal error
    * after the retry budget is exhausted (mirrors `failed_regions`,
    * py:141/195-201).
    */
  final case class FetchResult(
      region: String, body: Option[String], error: Option[String])

  /** The reference's URL shape (py:147-151): lat/lon point lookup in
    * metric units.
    */
  def urlFor(cfg: FetchConfig, lat: Double, lon: Double): String =
    s"${cfg.baseUrl}?lat=$lat&lon=$lon&appid=${cfg.apiKey}&units=metric"

  /** Blocking GET with the configured timeout; throws on non-2xx like
    * `raise_for_status` (py:156). Package-visible so tests can exercise
    * it against a local socket if desired; [[fetchAll]] takes any
    * `String => String` so unit tests inject canned responses instead.
    */
  private[ingest] def httpGet(cfg: FetchConfig)(url: String): String = {
    val conn = new URI(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setConnectTimeout(cfg.timeoutMs)
      conn.setReadTimeout(cfg.timeoutMs)
      conn.setRequestMethod("GET")
      val code = conn.getResponseCode
      // never echo the URL: its query string carries the API key, and
      // this message propagates into FetchResult.error -> logs/alerts
      if (code < 200 || code >= 300)
        throw new IOException(s"HTTP $code")
      new String(conn.getInputStream.readAllBytes, StandardCharsets.UTF_8)
    } finally conn.disconnect()
  }

  /** Sequential fetch of every region with per-region retry + isolation:
    * attempt 1 + `retries` retries, `retryDelayMs` apart; a region that
    * exhausts its budget yields an error result and the loop continues
    * (the reference logs and proceeds, py:196-204, then fails only if
    * NOTHING was extracted, py:206-207 — that guard belongs to the
    * caller, see [[graft.pipeline.WeatherPipeline]]'s C2 guards).
    */
  def fetchAll(
      cfg: FetchConfig,
      regions: Seq[(String, Double, Double)] = WeatherModel.regions,
      get: Option[String => String] = None): Seq[FetchResult] = {
    val doGet = get.getOrElse(httpGet(cfg) _)
    regions.map { case (region, lat, lon) =>
      val url = urlFor(cfg, lat, lon)
      var attempt = 0
      var result: Option[FetchResult] = None
      while (result.isEmpty) {
        try result = Some(FetchResult(region, Some(doGet(url)), None))
        catch {
          case e: Exception if attempt < cfg.retries =>
            attempt += 1
            cfg.sleep(cfg.retryDelayMs)
          case e: Exception =>
            result = Some(FetchResult(region, None,
              Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")))
        }
      }
      result.get
    }
  }

  /** Successful bodies → nested document rows (the same shape
    * [[WeatherIngest.readDocuments]] produces from fixtures), ready for
    * [[WeatherIngest.flatten]]. The region name from the fetch loop wins
    * over anything in the payload — the reference keys records by its own
    * region list, not the API echo (py:161-162).
    */
  def toDocuments(
      spark: SparkSession, results: Seq[FetchResult]): DataFrame = {
    import spark.implicits._
    val ok = results.collect {
      case FetchResult(region, Some(body), _) => (region, body)
    }
    val docCols = WeatherModel.owmSchema.fields.toSeq
      .filter(_.name != "region")
      .map(f => col(s"__doc.`${f.name}`").as(f.name))
    ok.toDF("__region", "__body")
      .select(col("__region"),
        from_json(col("__body"), WeatherModel.owmSchema).as("__doc"))
      .select(col("__region").as("region") +: docCols: _*)
  }
}
