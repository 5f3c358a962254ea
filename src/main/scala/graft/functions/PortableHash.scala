package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{conv, md5, substring}

/** Engine-portable md5-prefix integer — THE hash convention every
  * oracle-compared integer digest rides (DSIR feature buckets, chunk
  * content keys, the anti-entropy table checksum). One definition per
  * engine so the Spark expression and its DuckDB twin cannot drift:
  * Spark renders `conv(substr(md5(x), 1, n), 16, 10)`, DuckDB casts the
  * same hex prefix via a `'0x'` literal. `nHex ≤ 15` keeps the value
  * inside a positive BIGINT (60 bits).
  */
object PortableHash {

  def md5PrefixLong(c: Column, nHex: Int): Column = {
    require(nHex >= 1 && nHex <= 15, s"nHex $nHex outside positive-BIGINT range")
    conv(substring(md5(c), 1, nHex), 16, 10).cast("long")
  }

  /** DuckDB twin of [[md5PrefixLong]]; `e` is a SQL expression string. */
  def md5PrefixLongSql(e: String, nHex: Int): String = {
    require(nHex >= 1 && nHex <= 15, s"nHex $nHex outside positive-BIGINT range")
    s"CAST(('0x' || substr(md5($e), 1, $nHex)) AS BIGINT)"
  }
}
