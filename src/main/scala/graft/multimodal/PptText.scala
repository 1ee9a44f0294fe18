package graft.multimodal

/** Legacy PowerPoint (.ppt, MS-PPT) text extraction over the [[Cfb]]
  * container — the third member of the legacy Office trio
  * ([[DocText]] prose, [[XlsText]] tables, this one slides). Decks
  * are a steady crawl class (conference sites, lecture archives,
  * corporate downloads) whose TEXT otherwise rots in the media face.
  *
  * Profile (the PowerPoint-97+ record model):
  *   - The `PowerPoint Document` stream: a flat-plus-nested sequence
  *     of records `[recVerAndInstance u16][recType u16][recLen u32]`
  *     — a record whose recVer nibble is 0xF is a CONTAINER whose
  *     payload is itself a record sequence (the walk recurses,
  *     depth-capped; a crafted recLen past the payload fences —
  *     truncated structure must not become partial text).
  *   - Text lives in `TextCharsAtom` (0x0FA0, UTF-16LE) and
  *     `TextBytesAtom` (0x0FA8, bytes = the low bytes of Unicode
  *     code points ≤ 0xFF), collected in stream order — the slide/
  *     drawing placement machinery is irrelevant to corpus text.
  *     In-atom paragraph marks (CR) and vertical tabs (the soft
  *     line break) normalize to NEWLINE; atoms join with NEWLINE.
  *   - `CryptSession10Container` (0x2F14) anywhere → None: the
  *     persist directory points into ciphertext (the [[DocText]]
  *     fEncrypted rule).
  *   - Decks with no text atom at all → None (nothing extractable —
  *     an image-only deck stays a media blob).
  *
  * [[write]] is the identity-oracle writer: a real CFB container
  * whose `PowerPoint Document` stream nests one text atom inside a
  * DocumentContainer (so the oracle path exercises the recursion),
  * TextBytesAtom when every char fits a byte (the dominant real
  * encoding) and TextCharsAtom otherwise — `forceChars` pins the
  * UTF-16 arm for fixtures; newline→CR / identity back.
  */
object PptText {

  private def u16(b: Array[Byte], p: Int): Int =
    if (p < 0 || p + 2 > b.length) -1
    else (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    if (p < 0 || p + 4 > b.length) -1L
    else (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private val TextCharsAtom = 0x0FA0
  private val TextBytesAtom = 0x0FA8
  private val CryptSession = 0x2F14

  /** Total extracted-output cap (the [[Xlsx.MaxOutputChars]]
    * discipline). */
  private val MaxOutputChars: Long = 64L * 1024 * 1024

  /** Container recursion cap: real decks nest ~6 deep; a crafted
    * all-container stream must not recurse the stack away.
    */
  private val MaxDepth = 32

  def extract(bytes: Array[Byte]): Option[String] =
    extract(new Cfb.Doc(bytes))

  /** Shared-handle form (see [[Cfb.Doc]]). */
  def extract(doc: Cfb.Doc): Option[String] = {
    val ppt = doc.stream("PowerPoint Document").getOrElse(return None)
    val atoms = Vector.newBuilder[String]
    var n = 0
    var budget = MaxOutputChars
    // false = structural breakage (fence whole)
    def walk(from: Int, until: Int, depth: Int): Boolean = {
      if (depth > MaxDepth) return false
      var p = from
      while (p + 8 <= until) {
        val verInst = u16(ppt, p)
        val typ = u16(ppt, p + 2)
        val len = u32(ppt, p + 4)
        if (verInst < 0 || typ < 0 || len < 0 ||
            p + 8 + len > until) return false
        if (typ == CryptSession) return false // encrypted: fence closed
        val o = p + 8
        if ((verInst & 0xF) == 0xF) {
          if (!walk(o, (o + len).toInt, depth + 1)) return false
        } else if (typ == TextCharsAtom) {
          if (len % 2 != 0) return false
          budget -= len / 2
          if (budget < 0) return false
          atoms += new String(ppt, o, len.toInt, "UTF-16LE")
          n += 1
        } else if (typ == TextBytesAtom) {
          budget -= len
          if (budget < 0) return false
          atoms += new String(ppt, o, len.toInt, "ISO-8859-1")
          n += 1
        }
        p = (o + len).toInt
      }
      // trailing bytes under a record header are a cut record —
      // tolerate only at the TOP level (sector padding past the
      // stream's logical end never reaches here: Cfb sizes exactly)
      p == until || (depth == 0 && until - p < 8)
    }
    if (!walk(0, ppt.length, 0)) return None
    if (n == 0) return None // no text machinery at all: stay media
    Some(atoms.result()
      .map(_.replace('\r', '\n').replace('\u000b', '\n'))
      .mkString("\n"))
  }

  // ---- writer (fixture generator) ----

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def rec(verInst: Int, typ: Int,
                  data: Array[Byte]): Array[Byte] =
    le16(verInst) ++ le16(typ) ++ le32(data.length.toLong) ++ data

  /** One text atom nested in a DocumentContainer (0x03E8) inside the
    * stream — newline→CR in, identity back through [[extract]].
    */
  def write(text: String, forceChars: Boolean = false): Array[Byte] = {
    val body = text.replace('\n', '\r')
    val atom =
      if (!forceChars && body.forall(_ < 0x100))
        rec(0x0000, TextBytesAtom, body.getBytes("ISO-8859-1"))
      else rec(0x0000, TextCharsAtom, body.getBytes("UTF-16LE"))
    val container = rec(0x000F, 0x03E8, atom) // DocumentContainer
    Cfb.write(Seq(("PowerPoint Document", container),
      ("Current User", le32(20L) ++ le32(0xE391C05FL))))
  }
}
