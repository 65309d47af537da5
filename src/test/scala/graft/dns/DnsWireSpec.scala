package graft.dns

import org.scalatest.funsuite.AnyFunSuite

class DnsWireSpec extends AnyFunSuite {
  import DnsFixtures._

  test("A answer with compressed name renders dotted quad into rdatas") {
    val a = DnsWire.parse(aAnswerCompressed)
    assert(a.rcode == 0)
    assert(a.rdatas4 == Seq("93.184.216.34"))
    assert(a.rdatas6.isEmpty && a.cnames.isEmpty)
  }

  test("AAAA answer renders RFC 5952 form into rdatas6") {
    val a = DnsWire.parse(aaaaAnswer)
    assert(a.rdatas6 == Seq("2606:2800:220:1:248:1893:25c8:1946"))
  }

  test("zero-run compression in IPv6 rendering") {
    // build ::1 via an AAAA rdata of 15 zero bytes + 1
    val ip = (Array.fill(15)(0) :+ 1).map(_.toByte)
    val msg = response(0, rr(pointer(12), 28, ip))
    assert(DnsWire.parse(msg).rdatas6 == Seq("::1"))
  }

  test("CNAME chain: cname target classified as name (trailing dot), A as ip") {
    val a = DnsWire.parse(cnameChain)
    assert(a.cnames == Seq("target.example.com."))
    assert(a.rdatas4 == Seq("1.2.3.4"))
  }

  test("NXDOMAIN header-only answer: rcode 3, empty arrays") {
    val a = DnsWire.parse(nxdomain)
    assert(a == DnsAnswer(3, Nil, Nil, Nil))
  }

  test("TXT rdata concatenates character-strings, classified as cname bucket") {
    assert(DnsWire.parse(txtAnswer).cnames == Seq("hello world"))
  }

  test("MX / SRV / SOA render dnslib-style presentation strings") {
    val mx = response(0, rr(pointer(12), 15, u16(10) ++ encName("mail").dropRight(1) ++ pointer(12)))
    assert(DnsWire.parse(mx).cnames == Seq("10 mail.example.com."))

    val srv = response(0,
      rr(pointer(12), 33, u16(1) ++ u16(2) ++ u16(8080) ++ encName("svc", "example", "com")))
    assert(DnsWire.parse(srv).cnames == Seq("1 2 8080 svc.example.com."))

    val soaRdata = encName("ns1", "example", "com") ++ encName("admin", "example", "com") ++
      u32(2024010101) ++ u32(7200) ++ u32(3600) ++ u32(1209600) ++ u32(300)
    val soa = response(0, rr(pointer(12), 6, soaRdata))
    assert(DnsWire.parse(soa).cnames ==
      Seq("ns1.example.com. admin.example.com. 2024010101 7200 3600 1209600 300"))
  }

  test("pointer loop raises instead of hanging") {
    assertThrows[DnsWire.DnsParseException](DnsWire.parse(pointerLoop))
    assert(DnsWire.parseOpt(pointerLoop).isEmpty)
  }

  test("forward compression pointer parses (dnslib parity), loops still caught") {
    val a = DnsWire.parse(forwardPointer)
    assert(a.cnames == Seq("fwd.example.com."))
  }

  test("truncated message raises; parseOpt returns None") {
    assertThrows[DnsWire.DnsParseException](DnsWire.parse(truncated))
    assert(DnsWire.parseOpt(truncated).isEmpty)
    assert(DnsWire.parseOpt(Array[Byte](1, 2, 3)).isEmpty)
    assert(DnsWire.parseOpt(null).isEmpty)
  }

  test("isIpv4 strict semantics (netaddr/ClickHouse parity)") {
    assert(DnsWire.isIpv4("0.0.0.0"))
    assert(DnsWire.isIpv4("255.255.255.255"))
    assert(DnsWire.isIpv4("192.168.0.1"))
    assert(!DnsWire.isIpv4("256.1.1.1"))
    assert(!DnsWire.isIpv4("1.2.3"))
    assert(!DnsWire.isIpv4("1.2.3.4.5"))
    assert(!DnsWire.isIpv4("01.2.3.4")) // leading zero
    assert(!DnsWire.isIpv4("1.2.3.４")) // non-ASCII digit
    assert(!DnsWire.isIpv4(" 1.2.3.4"))
    assert(!DnsWire.isIpv4("a.b.c.d"))
    assert(!DnsWire.isIpv4(""))
    assert(!DnsWire.isIpv4(null))
  }

  test("isIpv6 pure-string semantics") {
    assert(DnsWire.isIpv6("::"))
    assert(DnsWire.isIpv6("::1"))
    assert(DnsWire.isIpv6("fe80::1"))
    assert(DnsWire.isIpv6("2001:db8:0:0:0:0:2:1"))
    assert(DnsWire.isIpv6("::ffff:1.2.3.4")) // embedded v4
    assert(!DnsWire.isIpv6("1.2.3.4"))
    assert(!DnsWire.isIpv6("example.com"))
    assert(!DnsWire.isIpv6("2001:db8::1::2")) // two "::"
    assert(!DnsWire.isIpv6("2001:db8:0:0:0:0:0:0:1")) // 9 groups
    assert(!DnsWire.isIpv6("g::1")) // bad hex
    assert(!DnsWire.isIpv6(""))
    assert(!DnsWire.isIpv6(null))
  }

  test("property: isIpv4 agrees with an independent octet-wise check (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val o = Array.fill(4)(rnd.nextInt(320))
      val s = o.mkString(".")
      assert(DnsWire.isIpv4(s) == o.forall(_ <= 255), s)
    }
  }

  test("property: random bytes never hang or throw unexpected exceptions") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      DnsWire.parseOpt(bytes) // must terminate; None or Some both fine
    }
    // and fuzzed mutations of a valid message
    (1 to 2000).foreach { _ =>
      val m = aAnswerCompressed.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      DnsWire.parseOpt(m)
    }
  }
}
