package graft.ext

import graft.SparkTestBase

class UrlsSpec extends SparkTestBase {

  private def c(u: String) = Urls.canonicalize(u)

  test("canonical rules: scheme/host case, trailing dot, default-port " +
    "elision, empty path, query sort, fragment drop, userinfo strip") {
    val r = c("HTTP://WWW.Example.COM.:80/A/b?z=1&a=2&m=3#frag").get
    assert(r.scheme == "http")
    assert(r.host == "www.example.com")
    assert(r.port.isEmpty)
    assert(r.path == "/A/b") // path case is significant, kept
    assert(r.query.contains("a=2&m=3&z=1"))
    assert(r.surt == "com,example,www)/A/b?a=2&m=3&z=1")
    assert(r.reg_domain == "example.com")
    assert(c("https://Host.org:443/").get.port.isEmpty)
    assert(c("https://host.org:80/").get.port.contains(80)) // not https' default
    assert(c("http://host.org:8080/x").get.port.contains(8080))
    assert(c("http://example.com").get.path == "/")
    assert(c("http://example.com#f").get.path == "/")
    assert(c("http://user:pw@example.com/x").get.host == "example.com")
    // '?' alone and trailing '?' → absent query
    assert(c("http://h.co/x?").get.query.isEmpty)
    // duplicate params kept, sorted adjacent
    assert(c("http://h.co/?b=2&a=1&b=1").get.query
      .contains("a=1&b=1&b=2"))
  }

  test("SURT and registered domain: label reversal, multi-TLD " +
    "exceptions, two-label and bare hosts, IPv6 passthrough") {
    val r = c("http://a.b.Example5.co.uk/p?x=1").get
    assert(r.surt == "uk,co,example5,b,a)/p?x=1")
    assert(r.reg_domain == "example5.co.uk")
    assert(c("http://deep.sub.example.com/").get.reg_domain
      == "example.com")
    assert(c("http://example.com/").get.reg_domain == "example.com")
    assert(c("http://localhost/").get.reg_domain == "localhost")
    assert(c("http://localhost/").get.surt == "localhost)/")
    val v6 = c("http://[2001:DB8::1]:8080/x").get
    assert(v6.host == "[2001:db8::1]" && v6.port.contains(8080))
    val v6d = c("https://[::1]:443/").get
    assert(v6d.port.isEmpty)
  }

  test("garbage fails soft: no scheme, empty host, bad port, " +
    "unclosed bracket, junk after bracket") {
    assert(c("not a url").isEmpty)
    assert(c("example.com/path").isEmpty)
    assert(c("://nohost").isEmpty)
    assert(c("http://").isEmpty)
    assert(c("http://:8080/x").isEmpty)
    assert(c("http://host:eighty/").isEmpty)
    assert(c("http://host:-1/").isEmpty)
    assert(c("http://host:70000/").isEmpty)
    assert(c("http://[::1/x").isEmpty)
    assert(c("http://[::1]junk/x").isEmpty)
    assert(c("ht tp://host/").isEmpty) // space in scheme
  }

  test("messy-url synth round trip: every canonical field matches the " +
    "schedule across ids, and the canonical tuple dedups case/order/" +
    "fragment variants to one key") {
    for (id <- 0L until 200L) {
      val r = c(Urls.messyUrl(id)).getOrElse(
        fail(s"messyUrl($id) failed to parse"))
      assert(r.scheme == (if (id % 2 == 0) "http" else "https"))
      assert(r.port == (if (id % 4 == 1) Some(8080) else None))
      assert((r.path == "/") == (id % 6 == 0))
      assert(r.query.isEmpty == (id % 3 == 0))
      assert(!r.url.contains("#") || r.surt == r.surt) // surt never has frag
      assert(!r.surt.contains("#"))
      if (id % 7 == 0) assert(r.reg_domain.endsWith(".co.uk"))
      else assert(r.reg_domain.endsWith(".com"))
    }
    // the dedup property: variants of one page share the canonical key
    val variants = Seq(
      "HTTP://WWW.Example.COM:80/a?b=2&a=1#x",
      "http://www.example.com./a?a=1&b=2",
      "http://user@www.example.com/a?b=2&a=1#other")
    val keys = variants.map(v => {
      val r = c(v).get
      (r.scheme, r.host, r.port, r.path, r.query)
    }).distinct
    assert(keys.size == 1, s"variants split into $keys")
    assert(variants.map(v => c(v).get.surt).distinct.size == 1)
  }
}
