package graft.core

/** Minimal JSON string escaping shared by the driver-contract emitters
  * (Verify's oracle_sql.json, Bench's stdout lines). One copy: a future
  * escaping fix cannot silently miss a caller. */
object Json {
  /** Escape `s` for embedding inside a JSON string literal: quote,
    * backslash, and ALL control chars (<0x20; common ones as their
    * short forms). */
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `escape` wrapped in quotes — a complete JSON string literal. */
  def str(s: String): String = "\"" + escape(s) + "\""
}
