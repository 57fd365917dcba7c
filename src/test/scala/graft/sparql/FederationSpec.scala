package graft.sparql

import graft.SparkTestBase
import graft.rdf._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** SERVICE failure modes against RECORDED-FIXTURE remotes — canned HTTP
  * behaviors a loopback-self federation can never produce: error status,
  * a peer slower than the read timeout, malformed result syntax, and a
  * stream cut mid-payload. Policy under test (`Exec.serviceBindings`):
  * non-SILENT surfaces the failure as "SERVICE failed"; SILENT degrades
  * to the empty binding so the local side of the join survives. */
class FederationSpec extends SparkTestBase {

  private val local = QuadStore.fromTerms(spark, Seq(
    (Uri("urn:a"), Uri("urn:name"), Lit("Alice")),
    (Uri("urn:b"), Uri("urn:name"), Lit("Bob"))))

  /** one-route fixture server; returns (url, stop) */
  private def fixture(handle: com.sun.net.httpserver.HttpExchange => Unit)
      : (String, () => Unit) = {
    val hs = com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress("localhost", 0), 0)
    hs.createContext("/sparql/", ex => {
      try handle(ex) catch { case _: Exception => () }
      finally ex.close()
    })
    hs.start()
    (s"http://localhost:${hs.getAddress.getPort}/sparql/",
      () => hs.stop(0))
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
                      code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
  }

  private def q(url: String, silent: Boolean): String = {
    val s = if (silent) "SILENT " else ""
    s"""SELECT ?n ?age WHERE {
       |  ?s <urn:name> ?n .
       |  SERVICE $s<$url> { ?s <urn:age> ?age }
       |} ORDER BY ?n""".stripMargin
  }

  private def names(url: String): Seq[String] =
    Sparql.run(local, spark, q(url, silent = true)).collect()
      .map(_.getString(0)).toSeq

  private def failsLoudly(url: String): Unit = {
    val e = intercept[Exception] {
      Sparql.run(local, spark, q(url, silent = false)).collect()
    }
    assert(e.getMessage.contains("SERVICE failed"), e.getMessage)
  }

  test("remote 500: non-SILENT raises, SILENT keeps local bindings") {
    val (url, stop) = fixture(respond(_, 500, "internal server error"))
    try {
      failsLoudly(url)
      assert(names(url) == Seq("Alice", "Bob"))
    } finally stop()
  }

  test("slow peer beyond read timeout: raises / degrades per SILENT") {
    val (url, stop) = fixture { ex =>
      Thread.sleep(3000)
      respond(ex, 200, "?s\t?age\n")
    }
    spark.conf.set("spark.graft.service.readTimeoutMs", "300")
    try {
      failsLoudly(url)
      assert(names(url) == Seq("Alice", "Bob"))
    } finally {
      spark.conf.unset("spark.graft.service.readTimeoutMs")
      stop()
    }
  }

  test("malformed TSV terms: raises / degrades per SILENT") {
    // an UNCLOSED IRI: starts like an NT term, fails to parse. (A fully
    // bare token would be legal — computed SELECT columns cross the
    // wire as bare lexicals.)
    val (url, stop) = fixture(respond(_, 200,
      "?s\t?age\n<urn:unclosed\t\"5\"\n"))
    try {
      failsLoudly(url)
      assert(names(url) == Seq("Alice", "Bob"))
    } finally stop()
  }

  test("stream cut mid-payload: raises / degrades per SILENT") {
    // promise more bytes than are sent, then close: the client sees a
    // premature EOF inside the body read
    val (url, stop) = fixture { ex =>
      val partial = "?s\t?age\n<urn:a>\t\"4".getBytes(UTF_8)
      ex.sendResponseHeaders(200, partial.length + 64)
      ex.getResponseBody.write(partial)
      ex.getResponseBody.flush()
    }
    try {
      failsLoudly(url)
      assert(names(url) == Seq("Alice", "Bob"))
    } finally stop()
  }

  test("well-formed empty result joins to nothing, SILENT or not") {
    val (url, stop) = fixture(respond(_, 200, "?s\t?age\n"))
    try {
      val strict = Sparql.run(local, spark, q(url, silent = false))
        .collect()
      assert(strict.isEmpty) // empty remote = empty join, NOT an error
      val lax = Sparql.run(local, spark, q(url, silent = true)).collect()
      assert(lax.isEmpty)
    } finally stop()
  }
}
