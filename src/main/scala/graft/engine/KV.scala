package graft.engine

/** The reference's universal record type: one `"<key> <value>"` text line,
  * whitespace-separated, key = first token, both uninterpreted strings
  * (reference: mr-bins/partition/partition.cpp:30-31,
  * mr-bins/reduce/reduce.cpp:23-27, README.md:14-44).
  *
  * In-flight the engine keeps this as a 2-column DataFrame
  * `(key STRING, value STRING)` so Catalyst/Tungsten handle layout, codegen
  * and shuffle; `KV` is the typed view for user lambdas (`Dataset[KV]`).
  */
case class KV(key: String, value: String)

object KV {
  val KeyCol = "key"
  val ValueCol = "value"
  /** Column name used for raw (pre-KV) text lines, matching
    * `spark.read.text`'s output schema. */
  val LineCol = "value"
}
