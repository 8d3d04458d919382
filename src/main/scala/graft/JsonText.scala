package graft

/** Minimal JSON string escaping shared by every JSONL/JSON writer in the repo
  * ([[Verify]]'s oracle dump, [[graft.cdc.StatusListener]]'s status feed): backslash,
  * quote, and ALL control chars (<0x20). One definition — two independent escapers had
  * drifted into byte-identical copies, and a future fix to one (lone surrogates, U+007F)
  * would not reach the other, producing JSONL one driver-side `json.load` accepts and
  * the other rejects. */
object JsonText {
  def escape(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  /** `escape` wrapped in double quotes — a complete JSON string literal. */
  def quote(s: String): String = "\"" + escape(s) + "\""
}
