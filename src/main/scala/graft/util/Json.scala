package graft.util

/** Shared JSON string escaping for the hand-rolled sink/provider codecs
  * (the build is dependency-free by design; this is the one escape
  * implementation every codec must use). */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
