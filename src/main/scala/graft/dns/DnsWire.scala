package graft.dns

import scala.collection.mutable.ArrayBuffer

/** Result of parsing one DNS wire-format message: response code plus the
  * answer-section rdatas classified the way the reference's collector does
  * (`/root/reference/src/collector.py:29-41`): every answer RR is rendered to a
  * string and then bucketed by *string shape* — IPv4 literal → `rdatas4`, IPv6
  * literal → `rdatas6`, anything else (CNAME targets, TXT, ...) → `cnames`.
  * Classification by rendered string (not by RR type) is intentional parity
  * with the reference.
  */
final case class DnsAnswer(
    rcode: Int,
    rdatas4: Seq[String],
    rdatas6: Seq[String],
    cnames: Seq[String]
)

/** Minimal, allocation-light RFC 1035 message parser — pure Scala, zero Spark
  * deps, so it is unit-testable and embeddable in a codegen'd Catalyst
  * expression later.
  *
  * Scope (mirrors what the reference needs, `/root/reference/src/collector.py:29-41`):
  *   - header (12 bytes) → rcode (low nibble of flags byte 3)
  *   - skip question section
  *   - walk answer RRs with full name decompression (0xC0 pointers), rendering
  *     rdata to strings: A → dotted quad, AAAA → RFC 5952 compressed hex,
  *     CNAME/NS/PTR/DNAME → decompressed name with trailing dot (dnslib
  *     `str(rdata)` parity), TXT → concatenated character-strings, other types
  *     → lowercase hex of the raw rdata.
  *
  * Robustness (reference swallows per-row exceptions, collector.py:76-78): any
  * truncation / malformed structure raises `DnsParseException`, which callers
  * turn into a dropped row or an rcode-only answer. Pointer loops are guarded
  * by a monotonic-offset rule + jump budget, so no input can hang the parser.
  */
object DnsWire {

  final class DnsParseException(msg: String) extends Exception(msg)

  private def fail(msg: String): Nothing = throw new DnsParseException(msg)

  @inline private def u8(b: Array[Byte], i: Int): Int = {
    if (i < 0 || i >= b.length) fail(s"offset $i out of bounds (${b.length})")
    b(i) & 0xff
  }

  @inline private def u16(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)

  /** Decode a (possibly compressed) domain name starting at `off`.
    * @return (labels joined by '.', offset just past the name at the top level)
    */
  private[dns] def readName(b: Array[Byte], off: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder(32)
    var i = off
    var end = -1 // top-level end offset, fixed at the first pointer jump
    var jumps = 0
    var labels = 0
    var done = false
    var visited: java.util.BitSet = null // pointer targets seen (lazy: most names have 0-1 jumps)
    while (!done) {
      val len = u8(b, i)
      if ((len & 0xc0) == 0xc0) { // compression pointer
        val target = ((len & 0x3f) << 8) | u8(b, i + 1)
        if (end < 0) end = i + 2
        // dnslib (the reference's parser, collector.py:30) accepts FORWARD
        // pointers with loop detection only; a backwards-only rule would
        // drop legal-if-unusual messages as corrupt. The walk from a target
        // is deterministic, so any loop must revisit a pointer target —
        // a visited-target set bounds loops exactly (jump budget as a
        // second fence).
        if (visited == null) visited = new java.util.BitSet(b.length)
        if (visited.get(target)) fail(s"compression pointer loop at $target")
        visited.set(target)
        jumps += 1
        if (jumps > 128) fail("too many compression jumps")
        i = target
      } else if ((len & 0xc0) != 0) {
        fail(f"reserved label type 0x$len%02x")
      } else if (len == 0) {
        if (end < 0) end = i + 1
        done = true
      } else {
        if (i + 1 + len > b.length) fail("label runs past end of message")
        if (labels > 0) sb.append('.')
        var j = i + 1
        val stop = i + 1 + len
        while (j < stop) { sb.append((b(j) & 0xff).toChar); j += 1 }
        labels += 1
        if (sb.length() > 255) fail("name exceeds 255 octets")
        i = stop
      }
    }
    (sb.toString, end)
  }

  /** Skip a name without materializing it. @return offset just past it. */
  private def skipName(b: Array[Byte], off: Int): Int = {
    var i = off
    while (true) {
      val len = u8(b, i)
      if ((len & 0xc0) == 0xc0) return i + 2
      else if (len == 0) return i + 1
      else if ((len & 0xc0) != 0) fail(f"reserved label type 0x$len%02x")
      else i = i + 1 + len
    }
    i // unreachable
  }

  private def renderIpv4(b: Array[Byte], off: Int): String =
    s"${u8(b, off)}.${u8(b, off + 1)}.${u8(b, off + 2)}.${u8(b, off + 3)}"

  /** RFC 5952 text form: lowercase hex, longest zero-run (len>=2) → "::". */
  private[dns] def renderIpv6(b: Array[Byte], off: Int): String = {
    val g = new Array[Int](8)
    var k = 0
    while (k < 8) { g(k) = u16(b, off + 2 * k); k += 1 }
    // find longest run of zero groups
    var bestStart = -1; var bestLen = 0; var curStart = -1; var curLen = 0
    k = 0
    while (k < 8) {
      if (g(k) == 0) {
        if (curStart < 0) { curStart = k; curLen = 1 } else curLen += 1
        if (curLen > bestLen) { bestLen = curLen; bestStart = curStart }
      } else { curStart = -1; curLen = 0 }
      k += 1
    }
    val sb = new java.lang.StringBuilder(40)
    if (bestLen >= 2) {
      var i = 0
      while (i < bestStart) {
        if (i > 0) sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(i)))
        i += 1
      }
      sb.append("::")
      i = bestStart + bestLen
      var first = true
      while (i < 8) {
        if (!first) sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(i)))
        first = false
        i += 1
      }
    } else {
      var i = 0
      while (i < 8) {
        if (i > 0) sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(i)))
        i += 1
      }
    }
    sb.toString
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def renderHex(b: Array[Byte], off: Int, len: Int): String = {
    val sb = new java.lang.StringBuilder(len * 2)
    var i = off
    while (i < off + len) {
      val v = b(i) & 0xff
      sb.append(hexDigits(v >> 4)).append(hexDigits(v & 0xf))
      i += 1
    }
    sb.toString
  }

  @inline private def dotted(b: Array[Byte], off: Int): String = {
    val (name, _) = readName(b, off)
    name + "." // dnslib prints absolute names with the trailing dot
  }

  /** Render one RR's rdata to its presentation string (dnslib `str(rdata)`
    * shapes, pinned by fixtures). */
  private def renderRdata(b: Array[Byte], typ: Int, off: Int, len: Int): String =
    typ match {
      case 1 if len == 4   => renderIpv4(b, off) // A
      case 28 if len == 16 => renderIpv6(b, off) // AAAA
      case 2 | 5 | 12 | 39 => // NS | CNAME | PTR | DNAME: a (compressible) name
        dotted(b, off)
      case 15 => // MX: preference + exchange name
        s"${u16(b, off)} ${dotted(b, off + 2)}"
      case 33 => // SRV: priority weight port target
        s"${u16(b, off)} ${u16(b, off + 2)} ${u16(b, off + 4)} ${dotted(b, off + 6)}"
      case 6 => // SOA: mname rname serial refresh retry expire minimum
        val (mname, afterM) = readName(b, off)
        val (rname, afterR) = readName(b, afterM)
        val ints = (0 until 5).map(k => (u16(b, afterR + 4 * k).toLong << 16) | u16(b, afterR + 4 * k + 2))
        s"$mname. $rname. ${ints.mkString(" ")}"
      case 16 => // TXT: sequence of <len><chars> strings, concatenated
        val sb = new java.lang.StringBuilder(len)
        var i = off
        while (i < off + len) {
          val l = u8(b, i)
          if (i + 1 + l > off + len) fail("TXT character-string overruns rdata")
          var j = i + 1
          while (j < i + 1 + l) { sb.append((b(j) & 0xff).toChar); j += 1 }
          i = i + 1 + l
        }
        sb.toString
      case _ => renderHex(b, off, len)
    }

  /** Strict dotted-quad IPv4 test (4 decimal octets 0-255, no leading-zero
    * tolerance beyond single '0', no shorthand) — semantics of
    * `netaddr.valid_ipv4` / ClickHouse `isIPv4String`
    * (`/root/reference/src/collector.py:35`, `/root/reference/README.md:148`).
    */
  def isIpv4(s: String): Boolean = {
    if (s == null) return false
    val n = s.length
    if (n < 7 || n > 15) return false
    var i = 0
    var octets = 0
    while (octets < 4) {
      var v = 0
      var digits = 0
      var start = i
      while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
        v = v * 10 + (s.charAt(i) - '0')
        digits += 1
        if (digits > 3 || v > 255) return false
        i += 1
      }
      if (digits == 0) return false
      if (digits > 1 && s.charAt(start) == '0') return false // "01" invalid
      octets += 1
      if (octets < 4) {
        if (i >= n || s.charAt(i) != '.') return false
        i += 1
      }
    }
    i == n
  }

  /** Pure-string IPv6 validity test (never resolves; colon-hex incl. "::" and
    * embedded IPv4 tail) — semantics of `netaddr.valid_ipv6` / ClickHouse
    * `isIPv6String`. */
  def isIpv6(s: String): Boolean = {
    if (s == null || s.isEmpty) return false
    if (s.indexOf(':') < 0) return false
    var str = s
    // at most one "::"
    val dc = str.indexOf("::")
    if (dc >= 0 && str.indexOf("::", dc + 1) >= 0) return false
    val hasV4 = str.lastIndexOf('.') >= 0
    var v4ok = true
    var groupsNeeded = 8
    if (hasV4) {
      val lastColon = str.lastIndexOf(':')
      if (lastColon < 0) return false
      val tail = str.substring(lastColon + 1)
      if (!isIpv4(tail)) return false
      str = str.substring(0, lastColon + 1) + "0:0" // v4 tail = 2 groups
    }
    // split on ':' handling leading/trailing "::"
    val parts = str.split(":", -1)
    if (parts.length < 3 && dc < 0) return false
    var empties = 0
    var groups = 0
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.isEmpty) empties += 1
      else {
        if (p.length > 4) return false
        var j = 0
        while (j < p.length) {
          val c = p.charAt(j)
          val hex = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
          if (!hex) return false
          j += 1
        }
        groups += 1
      }
      i += 1
    }
    if (dc >= 0) {
      // "::" contributes 1..3 empty parts depending on position
      val atStart = str.startsWith("::")
      val atEnd = str.endsWith("::")
      val expectedEmpties = if (str == "::") 3 else if (atStart || atEnd) 2 else 1
      if (empties != expectedEmpties) return false
      groups <= groupsNeeded - 1 || (str == "::" && groups == 0)
    } else {
      empties == 0 && groups == groupsNeeded
    }
  }

  /** Parse a full DNS message. Throws DnsParseException on malformed input. */
  def parse(msg: Array[Byte]): DnsAnswer = {
    if (msg == null || msg.length < 12) fail("message shorter than 12-byte header")
    val rcode = msg(3) & 0x0f
    val qdcount = u16(msg, 4)
    val ancount = u16(msg, 6)
    var off = 12
    var q = 0
    while (q < qdcount) {
      off = skipName(msg, off)
      off += 4 // qtype + qclass
      q += 1
    }
    val r4 = new ArrayBuffer[String](4)
    val r6 = new ArrayBuffer[String](2)
    val cn = new ArrayBuffer[String](2)
    var a = 0
    while (a < ancount) {
      off = skipName(msg, off)
      val typ = u16(msg, off)
      off += 8 // type + class + ttl
      val rdlen = u16(msg, off)
      off += 2
      if (off + rdlen > msg.length) fail("rdata runs past end of message")
      val s = renderRdata(msg, typ, off, rdlen)
      // classify by *string shape*, mirroring collector.py:34-40
      if (isIpv4(s)) r4 += s
      else if (isIpv6(s)) r6 += s
      else cn += s
      off += rdlen
      a += 1
    }
    DnsAnswer(rcode, r4.toSeq, r6.toSeq, cn.toSeq)
  }

  /** Lenient wrapper: malformed message → None (caller drops/continues, the
    * reference's per-row exception barrier, collector.py:76-78). */
  def parseOpt(msg: Array[Byte]): Option[DnsAnswer] =
    try Some(parse(msg))
    catch { case _: DnsParseException | _: ArrayIndexOutOfBoundsException => None }
}
