package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.server.StoreServer
import graft.store.Store

/** Integration test for the REST façade: drives the reference
  * `DataFrameClient`'s three endpoints (upload / get / list) over
  * localhost with reference-shaped payloads and `{"error": ...}`
  * bodies (client.py:66-215).
  */
class StoreServerSpec extends SparkSpec {

  private lazy val store =
    new Store(spark, Files.createTempDirectory("graft_http_").toString)
  private lazy val serverAndPort: (StoreServer, Int) = {
    val s = new StoreServer(spark, store)
    val p = s.start()
    (s, p)
  }
  private def base = s"http://127.0.0.1:${serverAndPort._2}"
  private val http = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    serverAndPort._1.stop()
    super.afterAll()
  }

  private def post(path: String, body: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/json")
      .header("Authorization", "Bearer test-token") // accepted, ignored
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(path: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /dataframes/upload stores a records payload with key partitioning") {
    // The exact payload shape client.py:113-119 sends.
    val records = """[{\"date\":\"2024-01-01\",\"id\":7,\"value\":1.5},""" +
      """{\"date\":\"2024-01-02\",\"id\":1503,\"value\":2.5}]"""
    val r = post("/dataframes/upload",
      s"""{"dataframe": "$records",
         | "dataframe_name": "my-test/test1",
         | "columns_keys": {"date": "Date", "id": "ID"},
         | "external_key": "v1",
         | "keep_last": false}""".stripMargin)
    assert(r.statusCode() == 200, r.body())
    assert(r.body().contains("\"version\":\"v1\""), r.body())
    // And the store really partitioned it.
    val parts = store.getPartitioned("my-test/test1")
      .select(col("__p_date").cast("string"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(parts == Set("2024-01-01", "2024-01-02"))
  }

  test("GET /dataframes/{name} returns records JSON; selectors work") {
    post("/dataframes/upload",
      """{"dataframe": "[{\"id\":1,\"v\":\"a\"}]",
        | "dataframe_name": "my-test/test2", "external_key": "v1"}""".stripMargin)
    post("/dataframes/upload",
      """{"dataframe": "[{\"id\":2,\"v\":\"b\"}]",
        | "dataframe_name": "my-test/test2", "external_key": "v2"}""".stripMargin)
    val all = get("/dataframes/my-test/test2")
    assert(all.statusCode() == 200)
    // accumulate read: both versions' rows in the array
    assert(all.body().contains("\"id\":1") && all.body().contains("\"id\":2"))
    val v1 = get("/dataframes/my-test/test2?external_key=v1")
    assert(v1.body().contains("\"id\":1") && !v1.body().contains("\"id\":2"))
    val last = get("/dataframes/my-test/test2?use_last=true")
    assert(last.body().contains("\"id\":2") && !last.body().contains("\"id\":1"))
  }

  test("GET /dataframes lists with segment-prefix filtering") {
    val r = get("/dataframes?prefix=my-test")
    assert(r.statusCode() == 200)
    assert(r.body().contains("\"my-test/test1\"") && r.body().contains("\"dataframes\""))
    assert(r.body().contains("\"columns_keys\":{\"date\":\"Date\",\"id\":\"ID\"}"))
  }

  test("errors come back as status + {'error': ...} bodies (client.py:132-137)") {
    // bad key type -> 400 with the reference-shaped message
    val bad = post("/dataframes/upload",
      """{"dataframe": "[{\"a\":1}]", "dataframe_name": "t-err",
        | "columns_keys": {"a": "Hash"}}""".stripMargin)
    assert(bad.statusCode() == 400, bad.body())
    assert(bad.body().startsWith("""{"error":""") &&
      bad.body().contains("Invalid key type"), bad.body())
    // missing table -> 404
    val missing = get("/dataframes/nope/nothing")
    assert(missing.statusCode() == 404 &&
      missing.body().startsWith("""{"error":"""), missing.body())
    // missing required field -> 400
    val noName = post("/dataframes/upload", """{"dataframe": "[{\"a\":1}]"}""")
    assert(noName.statusCode() == 400 &&
      noName.body().contains("dataframe_name is required"), noName.body())
    // unroutable -> 404 error body
    val noRoute = post("/dataframes/upload/extra", "{}")
    assert(noRoute.statusCode() == 404 &&
      noRoute.body().startsWith("""{"error":"""), noRoute.body())
    // malformed records payload -> 400, never a silently stored garbage table
    val garbage = post("/dataframes/upload",
      """{"dataframe": "not records json", "dataframe_name": "t-garbage"}""")
    assert(garbage.statusCode() == 400 &&
      garbage.body().contains("records-orient"), garbage.body())
    assert(get("/dataframes/t-garbage").statusCode() == 404)
    // JSON null name/dataframe -> 400, not a table named "null"
    val nullName = post("/dataframes/upload",
      """{"dataframe": "[{\"a\":1}]", "dataframe_name": null}""")
    assert(nullName.statusCode() == 400, nullName.body())
    val nullDf = post("/dataframes/upload",
      """{"dataframe": null, "dataframe_name": "t-null"}""")
    assert(nullDf.statusCode() == 400, nullDf.body())
  }

  test("GET answers 413 for over-cap tables; in-cap responses stream whole (r8)") {
    import spark.implicits._
    // A second server over the same store with a tiny row cap — the wire
    // format materializes client-side whole, so the cap is the honest
    // failure mode for tables that were never client-sized.
    val capped = new StoreServer(spark, store, maxGetRows = 3L)
    val port = capped.start()
    def getCapped(path: String): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
    try {
      store.load((1L to 10L).map(i => (i, s"r$i")).toDF("id", "v"),
        "my-test/big", externalKey = "v1")
      val over = getCapped("/dataframes/my-test/big")
      assert(over.statusCode() == 413, s"${over.statusCode()} ${over.body()}")
      assert(over.body().startsWith("""{"error":""") &&
        over.body().contains("exceeds 3 rows"), over.body())
      // In-cap table: the chunked stream must still be one well-formed
      // records array carrying every row.
      store.load((1L to 3L).map(i => (i, s"r$i")).toDF("id", "v"),
        "my-test/small", externalKey = "v1")
      val ok = getCapped("/dataframes/my-test/small")
      assert(ok.statusCode() == 200, ok.body())
      assert(ok.body().startsWith("[") && ok.body().endsWith("]"), ok.body())
      assert((1L to 3L).forall(i => ok.body().contains(s""""id":$i""")), ok.body())
      assert(ok.body().count(_ == ',') >= 2, "3 records need 2+ separators")
    } finally capped.stop()
  }

  test("wire gzip: compressed upload round-trips; gzip offered -> gzip body (r9)") {
    // Upload with Content-Encoding: gzip — a reference-era client whose
    // at-rest story is gzip (README.md:20) shipping compressed row-JSON.
    val payload =
      """{"dataframe": "[{\"id\":41,\"v\":\"gz\"},{\"id\":42,\"v\":\"gz2\"}]",
        | "dataframe_name": "my-test/gz", "external_key": "v1"}""".stripMargin
    val baos = new java.io.ByteArrayOutputStream()
    val gzOut = new java.util.zip.GZIPOutputStream(baos)
    gzOut.write(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    gzOut.close()
    val up = http.send(HttpRequest.newBuilder(URI.create(s"$base/dataframes/upload"))
      .header("Content-Type", "application/json")
      .header("Content-Encoding", "gzip")
      .POST(HttpRequest.BodyPublishers.ofByteArray(baos.toByteArray)).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(up.statusCode() == 200, up.body())

    // Download offering gzip: body must come back Content-Encoding: gzip
    // and gunzip to the same records array a plain GET returns.
    val gz = http.send(HttpRequest.newBuilder(
        URI.create(s"$base/dataframes/my-test/gz"))
      .header("Accept-Encoding", "gzip")
      .GET().build(), HttpResponse.BodyHandlers.ofByteArray())
    assert(gz.statusCode() == 200)
    assert(gz.headers().firstValue("Content-Encoding").orElse("") == "gzip")
    val body = new String(
      new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz.body())).readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(body == get("/dataframes/my-test/gz").body(), body)
    assert(body.contains("\"id\":41") && body.contains("\"id\":42"), body)

    // No Accept-Encoding -> identity body, no Content-Encoding header
    // (java.net.http sends none by default — the pre-r9 tests above
    // already pin that path); unsupported request encoding -> 400.
    val plain = get("/dataframes/my-test/gz")
    assert(plain.statusCode() == 200 && plain.body().startsWith("["))
    val bad = http.send(HttpRequest.newBuilder(URI.create(s"$base/dataframes/upload"))
      .header("Content-Encoding", "br")
      .POST(HttpRequest.BodyPublishers.ofString(payload)).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(bad.statusCode() == 400 &&
      bad.body().contains("unsupported Content-Encoding"), bad.body())
  }

  test("requireAuth: tokenless requests answer 401 {'error': ...}; bearer passes (r10)") {
    // Wire-SHAPE parity with the reference's Cognito gateway
    // (client.py:60-63 always sends `Bearer <token>`): a server opted
    // into requireAuth rejects bare requests before touching the store.
    val authed = new StoreServer(spark, store, requireAuth = true)
    val port = authed.start()
    def url(p: String) = URI.create(s"http://127.0.0.1:$port$p")
    try {
      val noTok = http.send(HttpRequest.newBuilder(url("/dataframes")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(noTok.statusCode() == 401, s"${noTok.statusCode()} ${noTok.body()}")
      assert(noTok.body().startsWith("""{"error":""") &&
        noTok.body().contains("Authorization"), noTok.body())
      val badScheme = http.send(HttpRequest.newBuilder(url("/dataframes"))
        .header("Authorization", "Basic dXNlcg==").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(badScheme.statusCode() == 401, badScheme.body())
      val ok = http.send(HttpRequest.newBuilder(url("/dataframes"))
        .header("Authorization", "Bearer any-token").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(ok.statusCode() == 200, s"${ok.statusCode()} ${ok.body()}")
    } finally authed.stop()
  }

  test("shipped python client runs the reference docstring flow over the live wire (r10)") {
    // The artifact a reference user actually executes
    // (clients/python/pandas_db_client.py) driven as a real python3
    // subprocess against the live HTTP server: load -> get(use_last) ->
    // list with prefix (client.py:1-32's docstring flow), plus the
    // {'error': ...} unwrapping and the client-side key-type guard.
    val clientDir = {
      val local = new java.io.File("clients/python")
      if (local.isDirectory) local.getAbsolutePath
      else new java.io.File(sys.props("user.dir"), "clients/python").getAbsolutePath
    }
    assume(new java.io.File(clientDir, "pandas_db_client.py").isFile)
    val script = Files.createTempFile("graft_pyclient_", ".py")
    Files.writeString(script,
      """import sys
        |sys.path.insert(0, sys.argv[1])
        |from pandas_db_client import DataFrameClient
        |
        |client = DataFrameClient(sys.argv[2], auth_token='ignored')
        |r = client.load_dataframe(
        |    [{'date': '2024-01-01', 'v': 1}, {'date': '2024-01-02', 'v': 2}],
        |    'py-test/test1', columns_keys={'date': 'Date'}, external_key='v1')
        |assert r.get('version') == 'v1', r
        |back = client.get_dataframe('py-test/test1', use_last=True)
        |rows = back.to_dict('records') if hasattr(back, 'to_dict') else back
        |assert sorted(row['v'] for row in rows) == [1, 2], rows
        |listing = client.list_dataframes(prefix='py-test')
        |names = [d['name'] for d in listing['dataframes']]
        |assert 'py-test/test1' in names, names
        |try:
        |    client.get_dataframe('py-test/nope')
        |    raise SystemExit('expected a GetError-shaped failure')
        |except Exception as e:
        |    msg = str(e)
        |    assert 'Error retrieving DataFrame' in msg and 'not found' in msg, msg
        |try:
        |    client.load_dataframe([{'a': 1}], 'py-test/bad',
        |                          columns_keys={'a': 'Hash'})
        |    raise SystemExit('expected a client-side key-type ValueError')
        |except ValueError:
        |    pass
        |print('PY-CLIENT-OK')
        |""".stripMargin)
    val proc = new ProcessBuilder("python3", script.toString, clientDir, base)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val rc = proc.waitFor()
    assert(rc == 0 && out.contains("PY-CLIENT-OK"), s"rc=$rc\n$out")
  }
}
