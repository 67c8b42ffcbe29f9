package graft.api

/** The one display-name → pipeline-code language table the serving layer
  * shares (search_api.py maps the UI's "hindi"/"gujarati" the same way in
  * every router) — /api/search and /eval/scripture must never diverge on it.
  */
private[graft] object Langs {
  def code(l: String): String = l.toLowerCase(java.util.Locale.ROOT) match {
    case "hindi" => "hi"
    case "gujarati" => "gu"
    case "english" => "en"
    case other => other
  }
}
