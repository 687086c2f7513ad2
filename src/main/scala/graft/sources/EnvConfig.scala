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
    * interpolation. Missing file → empty map (same as dotenv). */
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
          else raw
        k -> v
      }
      .toMap

  /** File values overlaid with the process environment. */
  def load(file: String = ".env", env: Map[String, String] = sys.env): Map[String, String] =
    parse(Paths.get(file)) ++ env
}
