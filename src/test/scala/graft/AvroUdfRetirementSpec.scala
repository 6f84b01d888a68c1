package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Pins the retirement of the legacy per-row Avro UDF pair
  * ([[graft.functions.AvroCodec.toAvroUdf]]/`fromAvroUdf`, deprecated
  * round 7): the only main-source call sites allowed are its own
  * definition and [[graft.AvroBench]], which exists to measure the
  * Catalyst expressions against it. Any engine query path reaching for
  * the UDFs (two serialization boundaries per record — the round-5
  * `weak` finding) fails this suite, complementing AvroCodecSpec's
  * q20 no-ScalaUDF plan assertion.
  */
class AvroUdfRetirementSpec extends AnyFunSuite {

  private val mainSrc = Paths.get("src/main/scala")
  private val allowed = Set(
    "graft/functions/AvroCodec.scala", // the (deprecated) definition
    "graft/AvroBench.scala")           // the benchmark baseline

  test("no main-source call site of the deprecated Avro UDF pair outside AvroBench") {
    assume(Files.isDirectory(mainSrc), s"run from the repo root (missing $mainSrc)")
    val walk = Files.walk(mainSrc)
    val offenders =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .filter { p =>
          val text = new String(Files.readAllBytes(p))
          // match calls/references, not scaladoc links like [[AvroCodec.toAvroUdf]]
          text.linesIterator.exists(l =>
            !l.trim.startsWith("*") && !l.trim.startsWith("//") &&
              (l.contains("toAvroUdf(") || l.contains("fromAvroUdf(")))
        }
        .map(p => mainSrc.relativize(p).toString)
        .toSet
      finally walk.close()
    assert((offenders -- allowed).isEmpty,
      s"deprecated Avro UDF pair referenced outside its allowed sites: ${offenders -- allowed}")
    // the guard itself must be live: the allowed sites do reference them
    assert(allowed.subsetOf(offenders), "allowlist out of date — update it")
  }

  test("both UDFs carry @deprecated (compile-time steering to the expressions)") {
    val src = new String(Files.readAllBytes(
      mainSrc.resolve("graft/functions/AvroCodec.scala")))
    assert(src.split("def toAvroUdf").head.contains("@deprecated"))
    assert(src.split("def fromAvroUdf").head.count(_ == '@') >= 2 ||
      src.split("def fromAvroUdf").head.contains("@deprecated"))
  }
}
