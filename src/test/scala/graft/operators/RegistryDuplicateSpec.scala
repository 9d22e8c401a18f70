package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The registry is a Map LITERAL, so a duplicate query name silently
  * collapses — the later entry shadows the earlier one, the registry count
  * stays flat, and a targeted verify of the name exercises the WRONG query
  * (exactly the round-11 near-miss: a second "q_kql_geo_buffer" shadowed
  * the round-10 point-buffer query and its oracle without any error).
  * This spec scans the source for registration sites and pins
  * source-count == registry.size, so the next duplicate key fails at test
  * time with both line numbers.
  */
class RegistryDuplicateSpec extends AnyFunSuite {

  test("every source-registered query name is unique and present in the registry") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/operators/Surface.scala")), "UTF-8")
    val reg = """"([A-Za-z0-9_]+)"\s*->\s*QueryDef\(""".r
    val names = reg.findAllMatchIn(src).map(_.group(1)).toSeq
    val dups = names.groupBy(identity).collect { case (n, occ) if occ.size > 1 => n }
    assert(dups.isEmpty,
      s"duplicate registry keys (later entry silently shadows the earlier): ${dups.mkString(", ")}")
    assert(names.size == Surface.registry.size,
      s"source registers ${names.size} queries but the registry map holds " +
        s"${Surface.registry.size} — a key collapsed or a QueryDef is built off-pattern")
    assert(names.toSet == Surface.registry.keySet,
      "source-scanned names differ from registry keys")
  }
}
