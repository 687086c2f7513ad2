package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class EnvConfigSpec extends AnyFunSuite {

  test("parse handles comments, blanks, quotes, equals-in-value, and missing files") {
    val f = Files.createTempFile("graft", ".env")
    Files.writeString(f,
      """# comment
        |bucket = s3://data
        |cosmos_system=cosmos
        |quoted="a b c"
        |single='x'
        |url=http://h?a=1&b=2
        |
        |not_a_kv_line
        |""".stripMargin)
    val m = EnvConfig.parse(f)
    assert(m == Map(
      "bucket" -> "s3://data", "cosmos_system" -> "cosmos",
      "quoted" -> "a b c", "single" -> "x", "url" -> "http://h?a=1&b=2"))
    assert(EnvConfig.parse(f.resolveSibling("nope.env")).isEmpty)
  }

  test("process env overrides file values") {
    val f = Files.createTempFile("graft", ".env")
    Files.writeString(f, "bucket=from_file\nonly_file=x\n")
    val m = EnvConfig.load(f.toString, Map("bucket" -> "from_env"))
    assert(m("bucket") == "from_env")
    assert(m("only_file") == "x")
  }
}
