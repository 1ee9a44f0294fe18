package graft

import graft.multimodal.Tar
import org.scalatest.funsuite.AnyFunSuite

/** TAR walk — checksum-validated headers, member round trips, GNU
  * longnames, the truncation discipline and hostile-byte fences.
  */
class TarSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("round trip: members by name/bytes, dirs skipped, padding exact") {
    val files = Seq(
      ("a.txt", b("alpha content")),
      ("exactly512", Array.tabulate[Byte](512)(_.toByte)),
      ("dir/nested.txt", b("nested")),
      ("empty", Array.emptyByteArray))
    val tar = Tar.write(files)
    val es = Tar.entries(tar).get
    assert(es.map(_.name) == files.map(_._1).toVector)
    files.zip(es).foreach { case ((name, data), e) =>
      assert(Tar.extract(tar, e).toSeq == data.toSeq, name)
    }
  }

  test("GNU longname applies to the NEXT member only") {
    val long = "x/" * 80 + "leaf.txt" // > 100 chars
    val tar = Tar.write(Seq(
      (long, b("long one")), ("short.txt", b("short one"))),
      longNameFor = Some(0))
    val es = Tar.entries(tar).get
    assert(es.map(_.name) == Vector(long, "short.txt"))
  }

  test("truncation: complete members keep, the cut one drops") {
    val tar = Tar.write(Seq(
      ("one", b("first member")), ("two", b("second member"))))
    // cut inside the second member's data
    val headerAndFirst = 512 + 512 + 512 // dir + hdr1 + data1(padded)
    val cut = java.util.Arrays.copyOfRange(tar, 0, headerAndFirst + 512 + 4)
    val es = Tar.entries(cut).get
    assert(es.map(_.name) == Vector("one"))
  }

  test("fences: null, short, prose, corrupt checksum, trailing garbage after valid members") {
    assert(Tar.entries(null).isEmpty)
    assert(Tar.entries(b("ustar is the tar magic, this is prose")).isEmpty)
    assert(Tar.entries(new Array[Byte](511)).isEmpty)
    val ok = Tar.write(Seq(("f", b("fenced content"))))
    val bad = ok.clone()
    bad(20) = (bad(20) ^ 0x55).toByte // inside uid field: checksum breaks
    assert(Tar.entries(bad).isEmpty, "first-header checksum fence")
    // garbage AFTER a valid member: the member survives, walk stops
    val garb = ok.dropRight(1024) ++ Array.fill[Byte](512)(0x5A)
    val es = Tar.entries(garb).get
    assert(es.map(_.name) == Vector("f"))
  }
}
