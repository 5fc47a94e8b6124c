package graft.etl

import graft.etl.dsl.Ast.DslError

/** Dashboard config (`/root/reference/main.gs:144-165`): key/value
  * rows, lowercased/trimmed keys, only `source`/`map`/`output`
  * (+ the roadmap `history`, below) accepted, defaults applied when
  * the sheet or a key is absent, and all three names must be
  * non-empty.
  *
  * @param history when non-empty, [[Engine.runMapping]] appends one
  *                run record per invocation to the parquet table
  *                `<dir>/<history>` — the reference roadmap's
  *                "Execution history" / "Logging dashboard"
  *                (`/root/reference/README.md:124-125`, never
  *                implemented there; semantics defined here). Empty
  *                (the default) disables recording.
  * @param historyCompactEvery the run-history growth guard: when > 0
  *                and the history table holds at least this many
  *                parquet files, [[Engine.runMapping]] compacts it in
  *                place after recording (each run appends ONE file, so
  *                file count ≈ runs since the last compact; the
  *                millions-of-runs case stays bounded at ~this many
  *                files). 0 (the default) leaves compaction to the
  *                operator via `sources.Compaction`. Dashboard key:
  *                `history_compact_every`.
  */
final case class EngineConfig(
    source: String = "Source",
    map: String = "Map",
    output: String = "Output",
    history: String = "",
    historyCompactEvery: Int = 0) {
  Seq("source" -> source, "map" -> map, "output" -> output).foreach {
    case (k, v) =>
      if (v == null || v.trim.isEmpty)
        throw DslError(s"""Config name "$k" must be non-empty.""")
  }
  // all four are interpolated into filesystem paths
  Seq("source" -> source, "map" -> map, "output" -> output,
      "history" -> history).foreach { case (k, v) =>
    if (v != null &&
        (v.contains("/") || v.contains("\\") || v.contains("..")))
      throw DslError(s"""Config name "$k" must not contain path """ +
        """separators or "..".""")
  }
}

object EngineConfig {
  /** Parse from key/value pairs (a 2-column Dashboard CSV). Unknown
    * keys ignored; later duplicates overwrite (`main.gs:150-156`).
    */
  def fromKeyValues(kvs: Seq[(String, String)]): EngineConfig = {
    var (s, m, o, h) = ("Source", "Map", "Output", "")
    var hce = 0
    kvs.foreach { case (k, v) =>
      val key = Option(k).getOrElse("").trim.toLowerCase
      val value = Option(v).getOrElse("").trim
      if (value.nonEmpty) key match {
        case "source"  => s = value
        case "map"     => m = value
        case "output"  => o = value
        case "history" => h = value
        case "history_compact_every" =>
          hce = try value.toInt catch {
            case _: NumberFormatException => throw DslError(
              s"""Config "history_compact_every" must be an """ +
                s"""integer; got "$value".""")
          }
        case _         => ()
      }
    }
    EngineConfig(s, m, o, h, hce)
  }
}
