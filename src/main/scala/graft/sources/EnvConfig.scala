package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** S4: flat `KEY=VALUE` config, the Scala equivalent of the reference's
  * `dotenv_values()` (`etl_job.py:128`). Precedence: process environment
  * overrides file values (standard twelve-factor behavior), so a cluster
  * submit can override any path without editing files.
  */
object EnvConfig {

  /** Parse a `.env`-style file: `KEY=VALUE` lines, `#` comments, blank
    * lines ignored, surrounding single/double quotes stripped, no
    * interpolation. Unquoted values drop a trailing ` # inline comment`
    * (whitespace-then-hash, python-dotenv's rule — `bucket=s3://d # prod`
    * must yield `s3://d`, not a path with a comment embedded); quoted
    * values keep their `#`s. Missing file → empty map (same as dotenv). */
  def parse(path: Path): Map[String, String] =
    if (!Files.exists(path)) Map.empty
    else Files.readAllLines(path).asScala.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
      .map { l =>
        val i = l.indexOf('=')
        val k = l.substring(0, i).trim
        val raw = l.substring(i + 1).trim
        val v =
          if (raw.length >= 2 &&
            ((raw.head == '"' && raw.last == '"') || (raw.head == '\'' && raw.last == '\'')))
            raw.substring(1, raw.length - 1)
          else {
            val hash = raw.indexWhere(_ == '#')
            if (hash > 0 && raw(hash - 1).isWhitespace) raw.substring(0, hash).trim
            else raw
          }
        k -> v
      }
      .toMap

  /** File values overlaid with the process environment. `requireFile`
    * makes a missing file an error instead of dotenv's silent empty map —
    * for explicitly-passed paths, where "empty config" really means a
    * typo'd filename that would otherwise surface as an unrelated
    * key-not-found (or a silently wrong same-named env var) much later. */
  def load(file: String = ".env", env: Map[String, String] = sys.env,
           requireFile: Boolean = false): Map[String, String] = {
    val p = Paths.get(file)
    require(!requireFile || Files.exists(p), s"config file not found: $file")
    parse(p) ++ env
  }
}
