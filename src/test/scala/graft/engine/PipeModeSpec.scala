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

  test("stdioCommand wraps the reference's -i/-o file contract, path shell-quoted") {
    assert(PipeMode.stdioCommand("/bin/mapbin") ===
      Seq("sh", "-c", "'/bin/mapbin' -i /dev/stdin -o /dev/stdout "))
    // a staging path with a space must exec as ONE command word
    assert(PipeMode.stdioCommand("/tmp/my tools/mapbin") ===
      Seq("sh", "-c", "'/tmp/my tools/mapbin' -i /dev/stdin -o /dev/stdout "))
  }

  test("a real -i/-o binary that OPENS its file arguments runs the reference wordcount") {
    import spark.implicits._
    import java.nio.file.{Files, Path}
    import java.nio.file.attribute.PosixFilePermissions

    // Stand-ins for the reference's compiled map/reduce binaries
    // (WorkerImplTest.java:65-146): each parses -i <in> -o <out>, OPENS
    // both files itself (no stdin/stdout fallback in the script body), and
    // dies on missing args — so the test fails unless stdioCommand's
    // /dev/stdin + /dev/stdout wiring genuinely satisfies the file
    // contract end-to-end.
    def binary(dir: Path, name: String, body: String): String = {
      val p = dir.resolve(name)
      Files.writeString(
        p,
        s"""#!/bin/sh
           |in=""; out=""
           |while [ $$# -gt 0 ]; do
           |  case "$$1" in
           |    -i) in="$$2"; shift 2;;
           |    -o) out="$$2"; shift 2;;
           |    *) shift;;
           |  esac
           |done
           |[ -n "$$in" ] && [ -n "$$out" ] || { echo "missing -i/-o" >&2; exit 2; }
           |$body < "$$in" > "$$out"
           |""".stripMargin)
      Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x"))
      p.toString
    }

    val dir = Files.createTempDirectory("graft-pipe-bin-")
    // map.cpp: tokenize → "word 1"; reduce.cpp: sum ints per key
    val mapBin = binary(dir, "mapbin", "awk '{for(i=1;i<=NF;i++) print $i, 1}'")
    val reduceBin = binary(dir, "reducebin", "awk '{c[$1]+=$2} END {for(k in c) print k, c[k]}'")

    val lines = spark.createDataset(Seq("a b c", "a b c", "b z"))
    val mapped = PipeMode.mapChain(lines, Seq(PipeMode.stdioCommand(mapBin)))
    val reduced = PipeMode.reduceChain(mapped, Seq(PipeMode.stdioCommand(reduceBin)), rNum = 2)

    val counts = reduced.collect().filter(_.nonEmpty).map { l =>
      val Array(k, v) = l.split(" ", 2); k -> v
    }.toMap
    assert(counts === Map("a" -> "2", "b" -> "3", "c" -> "2", "z" -> "1"))
  }
}
