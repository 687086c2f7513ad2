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

  test("unquoted inline comments are stripped (python-dotenv parity), quoted kept") {
    val f = Files.createTempFile("graft", ".env")
    Files.writeString(f,
      """bucket=s3://data  # prod bucket
        |fragment=a#b
        |quoted="keep # this"
        |""".stripMargin)
    val m = EnvConfig.parse(f)
    assert(m("bucket") == "s3://data", "whitespace-then-# starts a comment")
    assert(m("fragment") == "a#b", "# without preceding whitespace is part of the value")
    assert(m("quoted") == "keep # this")
  }

  test("requireFile makes an explicitly-passed missing path fail fast") {
    val missing = Files.createTempDirectory("graft").resolve("prod.evn").toString
    val e = intercept[IllegalArgumentException] {
      EnvConfig.load(missing, Map.empty, requireFile = true)
    }
    assert(e.getMessage.contains("prod.evn"))
    // default stays dotenv-lenient
    assert(EnvConfig.load(missing, Map("k" -> "v")) == Map("k" -> "v"))
  }
}
