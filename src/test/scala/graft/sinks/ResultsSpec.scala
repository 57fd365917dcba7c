package graft.sinks

import graft.SparkTestBase

class ResultsSpec extends SparkTestBase {
  import spark.implicits._

  test("CSV unescape is a single pass: escaped backslash before n/t") {
    // NT cell "a\\nb" = literal containing BACKSLASH then n — must not
    // decode to a real newline (the chained-replace bug)
    val df = Seq("\"a\\\\nb\"", "\"x\\\\\\\\y\"", "\"t\\tv\"", "<urn:x>")
      .toDF("v")
    val lines = Results.toCsvLines(df)
    assert(lines(1) == "a\\nb", lines(1)) // backslash + 'n', no newline
    assert(lines(2) == "x\\\\y", lines(2)) // two escaped backslashes
    assert(lines(3) == "t\tv") // real tab from \t
    assert(lines(4) == "urn:x") // IRI unwrapped
  }
}
