package graft.engine

import graft.SparkSpec

/** Exercises the external-binary compatibility mode with real child
  * processes (awk stands in for the reference's statically-linked map/
  * reduce binaries — same stdin/stdout line contract,
  * README.md:14-44). */
class PipeModeSpec extends SparkSpec {

  test("map chain + reduce chain through external processes reproduces wordcount") {
    import spark.implicits._
    val lines = spark.createDataset(Seq("a b c", "a b c", "b z"))

    // map binary ≡ mr-bins/map/map.cpp: tokenize → "word 1"
    val mapCmd = Seq("sh", "-c", "awk '{for(i=1;i<=NF;i++) print $i, 1}'")
    // reduce binary ≡ mr-bins/reduce/reduce.cpp: sum ints per key
    val reduceCmd = Seq("sh", "-c", "awk '{c[$1]+=$2} END {for(k in c) print k, c[k]}'")

    val mapped = PipeMode.mapChain(lines, Seq(mapCmd))
    val reduced = PipeMode.reduceChain(mapped, Seq(reduceCmd), rNum = 2)

    val counts = reduced.collect().filter(_.nonEmpty).map { l =>
      val Array(k, v) = l.split(" ", 2); k -> v
    }.toMap
    assert(counts === Map("a" -> "2", "b" -> "3", "c" -> "2", "z" -> "1"))
  }

  test("stdioCommand wraps the reference's -i/-o file contract") {
    assert(PipeMode.stdioCommand("/bin/mapbin") ===
      Seq("sh", "-c", "/bin/mapbin -i /dev/stdin -o /dev/stdout "))
  }
}
