package graft.ingest

import java.io.IOException

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.WeatherModel

class WeatherFetchSpec extends SparkSpec {

  private val cfg = FetchConfig(
    baseUrl = "https://api.example.test/data/2.5/weather",
    apiKey = "k", retryDelayMs = 300000L, sleep = _ => ())

  private val threeRegions = WeatherModel.regions.take(3)

  private def cannedBody(region: String): String =
    Fixtures.full.replace("\"region\":\"Nakuru\"", s""""region":"$region"""")

  test("urlFor reproduces the reference's query shape") {
    val u = WeatherFetch.urlFor(cfg, -0.3031, 36.08)
    assert(u ===
      "https://api.example.test/data/2.5/weather?lat=-0.3031&lon=36.08&appid=k&units=metric")
  }

  test("fetchAll is sequential per region and carries each body through") {
    var calls = Vector.empty[String]
    val results = WeatherFetch.fetchAll(cfg, threeRegions,
      get = Some { url => calls :+= url; cannedBody("X") })
    assert(calls.size === 3)
    assert(results.map(_.region) === threeRegions.map(_._1))
    assert(results.forall(r => r.body.isDefined && r.error.isEmpty))
  }

  test("retry budget: 2 retries with the configured delay, then isolation") {
    var attempts = 0
    var slept = Vector.empty[Long]
    val failCfg = cfg.copy(sleep = d => slept :+= d)
    val results = WeatherFetch.fetchAll(failCfg, threeRegions.take(1),
      get = Some { _ => attempts += 1; throw new IOException("HTTP 503") })
    assert(attempts === 3, "1 attempt + 2 retries (py:52)")
    assert(slept === Vector(300000L, 300000L), "5-min delay per retry (py:53)")
    assert(results.head.body.isEmpty
      && results.head.error.exists(_.contains("HTTP 503")))
  }

  test("a failing region is isolated; the rest of the batch proceeds") {
    val results = WeatherFetch.fetchAll(cfg, threeRegions,
      get = Some { url =>
        if (url.contains(s"lat=${threeRegions(1)._2}"))
          throw new IOException("HTTP 500")
        else cannedBody("ok")
      })
    assert(results.count(_.body.isDefined) === 2)
    assert(results(1).error.isDefined)
  }

  test("httpGet against a local server: 200 returns body, 5xx raises, key not echoed") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/ok",
      (ex: HttpExchange) => reply(ex, 200, """{"cod":200}"""))
    server.createContext("/boom",
      (ex: HttpExchange) => reply(ex, 503, "unavailable"))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val localCfg = cfg.copy(timeoutMs = 5000)
      assert(WeatherFetch.httpGet(localCfg)(
        s"$base/ok?appid=SECRET") === """{"cod":200}""")
      val e = intercept[java.io.IOException] {
        WeatherFetch.httpGet(localCfg)(s"$base/boom?appid=SECRET")
      }
      assert(e.getMessage === "HTTP 503",
        "error must not echo the URL (the query string carries the API key)")
      assert(!e.getMessage.contains("SECRET"))
    } finally server.stop(0)
  }

  test("fetched documents flow through flatten like fixture documents") {
    val results = WeatherFetch.fetchAll(cfg, threeRegions,
      get = Some(_ => cannedBody("ignored-by-adapter")))
    val docs = WeatherFetch.toDocuments(spark, results)
    // the loop's region wins over the payload echo
    assert(docs.select("region").collect().map(_.getString(0)).toSeq
      === threeRegions.map(_._1))
    val flat = WeatherIngest.flatten(docs, WeatherModel.regionDim(spark),
      extractionTime = lit("2026-01-01 00:00:00").cast("timestamp"))
    val rows = flat.orderBy("region").collect()
    assert(rows.length === 3)
    // coordinates come from the broadcast dim, payload fields from the body
    val byRegion = threeRegions.map(r => r._1 -> r).toMap
    rows.foreach { r =>
      val (_, lat, lon) = byRegion(r.getAs[String]("region"))
      assert(r.getAs[Double]("latitude") === lat)
      assert(r.getAs[Double]("longitude") === lon)
      assert(r.getAs[Double]("temperature") === 22.5)
      assert(r.getAs[Double]("rainfall_1h") === 1.2)
    }
  }
}
