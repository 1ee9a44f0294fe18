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

  test("pax path override: >100-char paths recover, keyval zoo skipped, next member unaffected") {
    val long = ("deeply/" * 20) + "nested/final-archive-member-name.txt"
    assert(long.length > 100)
    val tar = Tar.write(Seq(
      (long, b("pax named content")), ("plain.txt", b("unaffected"))),
      paxPathFor = Some(0))
    val es = Tar.entries(tar).get
    assert(es.map(_.name) == Vector(long, "plain.txt"),
      "pax path must override the truncated header name for exactly " +
        "its member")
    assert(new String(Tar.extract(tar, es.head), "UTF-8") ==
      "pax named content")
    // a malformed keyval block ignores the override, keeps walking
    val okTar = Tar.write(Seq(("named.txt", b("x"))), paxPathFor = Some(0))
    val broken = okTar.clone()
    // the pax data block follows the dir block + pax header block
    val paxData = 512 + 512
    broken(paxData) = 'Z' // length prefix no longer decimal
    val es2 = Tar.entries(broken).get
    assert(es2.map(_.name) == Vector("named.txt"),
      "malformed pax block: the header's own name frames the member")
  }

  test("7z round trip: members by name/bytes, dirs skipped; fences: truncation, corrupt header, prose, caps") {
    import graft.multimodal.SevenZ
    val files = Seq(
      ("docs/a.txt", b("seven zip member alpha")),
      ("docs/b.bin", Array.tabulate[Byte](5000)(i => (i * 37).toByte)),
      ("empty", Array.emptyByteArray))
    val sz = SevenZ.write(files)
    assert(SevenZ.isSevenZ(sz))
    val ms = SevenZ.members(sz).get
    assert(ms.map(_._1) == files.map(_._1).toVector,
      "regular members in order, the directory entry skipped")
    files.foreach { case (n, d) =>
      assert(ms.find(_._1 == n).get._2.toSeq == d.toSeq, n)
    }
    // 7z keeps its directory machinery at fixed spots — truncation
    // anywhere fences WHOLE (the zip rationale, not tar's prefix-keep)
    Seq(sz.length - 1, sz.length / 2, 32, 6).foreach { n =>
      assert(SevenZ.members(
        java.util.Arrays.copyOfRange(sz, 0, n)).isEmpty, s"truncate $n")
    }
    // corrupt a header byte past the signature → fence, never a throw
    val bad = sz.clone()
    bad(13) = (bad(13) ^ 0x5A).toByte
    assert(SevenZ.members(bad).isEmpty)
    assert(SevenZ.members(b("7z is a compression format, says prose"))
      .isEmpty, "prose opening '7z' lacks the control-byte magic")
    assert(SevenZ.members(null).isEmpty)
  }

  test("hardlinks: header linkname and pax linkpath both resolve to the target's bytes; unresolvable links skip") {
    val tar = Tar.write(
      Seq(("orig.txt", b("the duplicated document")),
        ("other.txt", b("unrelated"))),
      hardlinks = Seq(
        ("copy.txt", "orig.txt"),
        ("ghost.txt", "never-archived.txt")), // unresolvable: skips
      paxLinkHard = Some(("paxcopy.txt",
        "orig.txt")), // target rides pax linkpath; header holds a decoy
      tailFile = Some(("tail.txt", b("after the links"))))
    val es = Tar.entries(tar).get
    assert(es.map(_.name) == Vector("orig.txt", "other.txt",
      "copy.txt", "paxcopy.txt", "tail.txt"),
      "resolvable links emit under the LINK's name; the ghost skips")
    assert(new String(Tar.extract(tar, es(2)), "UTF-8") ==
      "the duplicated document", "header-linkname hardlink")
    assert(new String(Tar.extract(tar, es(3)), "UTF-8") ==
      "the duplicated document",
      "pax linkpath must override the decoy header field")
    assert(new String(Tar.extract(tar, es(4)), "UTF-8") ==
      "after the links", "the walk stays framed past the links")
    // GNU 'K' long linkname (review regression): a hardlink whose
    // TARGET path exceeds 100 chars carries the full target in a 'K'
    // record; resolving by the truncated header field would silently
    // drop the link (or hit a truncation collision)
    val longTarget = ("deep/" * 22) + "target-document.txt"
    assert(longTarget.length > 100)
    val ktar = Tar.write(
      Seq((longTarget, b("the long-path duplicated document"))),
      longNameFor = Some(0),
      gnuLinkHard = Some(("klink.txt", longTarget)),
      tailFile = Some(("tail.txt", b("after the K link"))))
    val kes = Tar.entries(ktar).get
    assert(kes.map(_.name) == Vector(longTarget, "klink.txt", "tail.txt"))
    assert(new String(Tar.extract(ktar, kes(1)), "UTF-8") ==
      "the long-path duplicated document",
      "the 'K' record's full linkname must resolve the target")
    // legacy trap (ADVICE regression): pre-POSIX GNU tar / star wrote
    // the TARGET's size into the hardlink header's size field with NO
    // data blocks following — honoring the field would advance past
    // phantom blocks and misframe (drop) every later member
    val ltar = Tar.write(
      Seq(("orig.txt", b("the duplicated document")),
        ("other.txt", b("unrelated"))),
      hardlinks = Seq(("legacy.txt", "orig.txt")),
      legacyLinkSize = true,
      tailFile = Some(("tail.txt", b("after the legacy link"))))
    val les = Tar.entries(ltar).get
    assert(les.map(_.name) == Vector("orig.txt", "other.txt",
      "legacy.txt", "tail.txt"),
      "a nonzero size field on a '1' member must not eat phantom blocks")
    assert(new String(Tar.extract(ltar, les(2)), "UTF-8") ==
      "the duplicated document", "the legacy link still resolves")
    assert(new String(Tar.extract(ltar, les(3)), "UTF-8") ==
      "after the legacy link", "the walk stays framed past it")
  }

  test("GNU sparse members fence whole while the walk stays framed: old-GNU 'S' with a continuation block, pax GNU.sparse.*") {
    val tar = Tar.write(
      Seq(("head.txt", b("before the holes"))),
      sparseOldGnu = true,
      sparseData = Array.tabulate[Byte](700)(i => (i * 31).toByte),
      paxSparse = Some(("paxholes.bin", b("pax sparse archived region"))),
      tailFile = Some(("tail.txt", b("after the holes"))))
    val es = Tar.entries(tar).get
    assert(es.map(_.name) == Vector("head.txt", "tail.txt"),
      "both sparse members must fence (never silently-corrupt text); " +
        "framing must survive the continuation block")
    assert(new String(Tar.extract(tar, es(1)), "UTF-8") ==
      "after the holes")
    // sanity: the 'S' header and the GNU.sparse pax block really are
    // in the stream — the fences were exercised, not vacuous
    val flags = tar.grouped(512).map(blk => blk(156)).toVector
    assert(flags.contains('S'.toByte) && flags.contains('x'.toByte))
    // a truncated continuation chain (isextended=1 but EOF follows)
    // fences the walk without throwing; earlier members keep
    val hdrIx = tar.grouped(512).indexWhere(blk => blk(156) == 'S'.toByte)
    val cut = java.util.Arrays.copyOfRange(tar, 0, (hdrIx + 1) * 512)
    assert(Tar.entries(cut).get.map(_.name) == Vector("head.txt"),
      "sparse header at EOF: chain truncated, walk stops, prefix keeps")
  }

  test("REAL GNU tar parity: archives written by system tar (format=gnu/pax) — long names, 'K' hardlinks, sparse members fenced both ways") {
    // `tar (GNU tar) 1.34 --format=gnu --sparse` over a tree with a
    // >100-char path, two hardlinks (one to the long path — a real
    // 'K' record), and a hole-punched file; pinned verbatim. The
    // walk must recover every document, resolve both links, and
    // fence ONLY the sparse member while staying framed.
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/tar/$name")
      require(in != null, s"missing resource $name")
      try in.readAllBytes() finally in.close()
    }
    val gnu = res("gnu.tar")
    val es = Tar.entries(gnu).get
    val byName = es.map(e => e.name ->
      new String(Tar.extract(gnu, e), "UTF-8")).toMap
    val longPath = "./deeply/nested/directory/structure/that/keeps/" +
      "going/and/going/far/beyond/the/hundred/character/ustar/limit/" +
      "for/sure/original-target-document.txt"
    assert(es.length == 4, s"got ${es.map(_.name)}")
    assert(byName("./short.txt") == "plain short member\n")
    assert(byName(longPath) == "the original document content\n",
      "the 'L' long name must recover")
    assert(byName("./short-link.txt") == "plain short member\n",
      "the short hardlink must resolve")
    assert(byName("./link-to-long-target.txt") ==
      "the original document content\n",
      "the 'K' long-linkname hardlink must resolve to the long target")
    assert(!byName.contains("./sparse.bin"),
      "the old-GNU sparse member must fence")
    // pax --sparse: the member arrives as a regular '0' header whose
    // preceding 'x' block carries GNU.sparse.* keys — fence it, keep
    // the plain member
    val pax = Tar.entries(res("pax-sparse.tar")).get
    assert(pax.map(_.name) == Vector("short.txt"),
      s"pax-sparse must fence the sparse member only, got ${pax.map(_.name)}")
  }

  test("pax-then-L precedence: the POSIX pax path wins over a GNU longname for the same member") {
    val paxName = "pax/authoritative/name.txt"
    val tar = Tar.write(Seq(
      (paxName, b("both overrides present")), ("tail.txt", b("t"))),
      paxPathFor = Some(0), longNameFor = Some(0))
    val es = Tar.entries(tar).get
    assert(es.map(_.name) == Vector(paxName, "tail.txt"))
    // sanity: the 'L' block really is in the stream (header typeflag
    // 'L' at the block after the pax pair) — precedence was exercised,
    // not vacuous
    val flags = tar.grouped(512).map(b => b(156)).toVector
    assert(flags.contains('L'.toByte) && flags.contains('x'.toByte))
  }
}
