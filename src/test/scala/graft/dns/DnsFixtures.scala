package graft.dns

import java.io.ByteArrayOutputStream

/** Hand-built RFC 1035 wire-format fixtures (SURVEY.md §5.2): no DNS library
  * is used anywhere — these bytes are constructed label-by-label so the
  * parser is tested against the spec, not against itself. */
object DnsFixtures {

  def encName(labels: String*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    labels.foreach { l =>
      out.write(l.length)
      out.write(l.getBytes("ASCII"))
    }
    out.write(0)
    out.toByteArray
  }

  def pointer(offset: Int): Array[Byte] =
    Array(((offset >> 8) | 0xc0).toByte, (offset & 0xff).toByte)

  def u16(v: Int): Array[Byte] = Array((v >> 8).toByte, (v & 0xff).toByte)
  def u32(v: Int): Array[Byte] = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** 12-byte header; rcode goes in the low nibble of flags byte 3. */
  def header(rcode: Int, qdcount: Int, ancount: Int): Array[Byte] =
    u16(0x1234) ++ Array(0x81.toByte, (0x80 | rcode).toByte) ++
      u16(qdcount) ++ u16(ancount) ++ u16(0) ++ u16(0)

  def question(name: Array[Byte], qtype: Int): Array[Byte] =
    name ++ u16(qtype) ++ u16(1)

  def rr(name: Array[Byte], typ: Int, rdata: Array[Byte]): Array[Byte] =
    name ++ u16(typ) ++ u16(1) ++ u32(300) ++ u16(rdata.length) ++ rdata

  /** Standard response: one question (example.com A) + given answers. */
  def response(rcode: Int, answers: Array[Byte]*): Array[Byte] =
    header(rcode, 1, answers.length) ++
      question(encName("example", "com"), 1) ++
      answers.flatten.toArray

  // --- canned messages -----------------------------------------------------

  /** A-record answer 93.184.216.34, name compressed to the question name
    * (which starts at offset 12). */
  val aAnswerCompressed: Array[Byte] =
    response(0, rr(pointer(12), 1, Array(93, 184.toByte, 216.toByte, 34)))

  /** AAAA answer 2606:2800:220:1:248:1893:25c8:1946. */
  val aaaaAnswer: Array[Byte] = {
    val ip = Array(0x26, 0x06, 0x28, 0x00, 0x02, 0x20, 0x00, 0x01,
      0x02, 0x48, 0x18, 0x93, 0x25, 0xc8, 0x19, 0x46).map(_.toByte)
    response(0, rr(pointer(12), 28, ip))
  }

  /** CNAME chain: example.com -> CNAME target.example.com (rdata uses a
    * compression pointer for the tail), then A for the target. */
  val cnameChain: Array[Byte] = {
    val cnameRdata = encName("target").dropRight(1) ++ pointer(12) // "target" + ptr to example.com
    response(0,
      rr(pointer(12), 5, cnameRdata),
      rr(pointer(12), 1, Array(1, 2, 3, 4)))
  }

  /** NXDOMAIN: rcode 3, no answers. */
  val nxdomain: Array[Byte] = response(3)

  /** TXT record "hello world". */
  val txtAnswer: Array[Byte] = {
    val txt = "hello world"
    response(0, rr(pointer(12), 16, Array(txt.length.toByte) ++ txt.getBytes("ASCII")))
  }

  /** Malicious: CNAME rdata whose name is a compression pointer to itself —
    * exercises readName's loop guard (rdata names are the decompressed
    * path; RR owner names are only skipped). Must not hang. */
  val pointerLoop: Array[Byte] = {
    val base = header(0, 0, 1)
    // RR at offset 12: owner name = ptr (skipped), type CNAME, rdata at
    // offset 24 = pointer to offset 24 (itself)
    base ++ pointer(12) ++ u16(5) ++ u16(1) ++ u32(300) ++ u16(2) ++ pointer(24)
  }

  /** Legal-if-unusual: CNAME rdata at offset 24 is a FORWARD pointer to a
    * name stored at offset 26 (trailing bytes after the RR). dnslib (the
    * reference's parser) accepts forward pointers with loop detection only;
    * this pins the same behavior. */
  val forwardPointer: Array[Byte] = {
    val base = header(0, 0, 1)
    base ++ pointer(26) ++ u16(5) ++ u16(1) ++ u32(300) ++ u16(2) ++
      pointer(26) ++ encName("fwd", "example", "com")
  }

  /** Truncated mid-rdata. */
  val truncated: Array[Byte] = aAnswerCompressed.dropRight(2)

  def b64(msg: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(msg)
}
