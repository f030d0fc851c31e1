package graft.ops

/** Registrable-domain resolution backed by a PUBLIC SUFFIX LIST snapshot.
  *
  * The last-two-labels heuristic misgroups every registry that sells names
  * under a second-level label: `a.example.co.uk` and `b.other.co.uk` both
  * collapsed to `co.uk`, merging unrelated sites in [[Urls.domainFilter]]
  * blocklists and per-domain stats. The fix is the Public Suffix List
  * (publicsuffix.org — Mozilla-maintained; the list data carries a
  * public-domain-style grant, the algorithm is published on the site):
  * the registrable domain is the longest matching public suffix plus one
  * label.
  *
  * [[MultiLabelSuffixes]] is a curated SNAPSHOT SUBSET (this environment
  * has no egress to fetch the full ~10k-line list): the multi-label ICANN
  * suffixes of the most common ccTLD registries. Single-label TLDs are
  * covered by the PSL's default `*` rule (any TLD is a suffix), which needs
  * no table. Wildcard rules (`*.ck` — [[WildcardSuffixes]] holds the
  * parent) and exception rules (`!www.ck` — [[ExceptionRules]]) are
  * evaluated per the published algorithm: exceptions prevail over
  * everything, otherwise the matching rule with the most labels wins,
  * otherwise `*`. Swapping in the full list is still a data change only.
  */
object PublicSuffix {

  /** Multi-label public suffixes, ICANN section snapshot subset. */
  val MultiLabelSuffixes: Set[String] = Set(
    // United Kingdom
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "ltd.uk", "plc.uk",
    "me.uk", "sch.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br", "blog.br",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "gen.nz", "geek.nz", "maori.nz",
    // South Africa
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    // India
    "co.in", "net.in", "org.in", "gov.in", "ac.in", "res.in", "firm.in", "gen.in", "ind.in", "edu.in",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    // Mexico
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    // Argentina
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar", "tur.ar",
    // South Korea
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr", "pe.kr", "ms.kr", "es.kr", "hs.kr",
    // Taiwan
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    // Hong Kong
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    // Singapore
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    // Israel
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il", "idf.il", "k12.il",
    // Ukraine
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    // Thailand
    "co.th", "net.th", "or.th", "go.th", "ac.th", "in.th", "mi.th",
    // Indonesia
    "co.id", "net.id", "or.id", "go.id", "ac.id", "web.id", "my.id", "biz.id", "sch.id",
    // Malaysia
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    // Philippines
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph", "i.ph",
    // Vietnam
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "ac.vn", "info.vn",
    "int.vn", "biz.vn", "name.vn", "pro.vn", "health.vn",
    // Poland
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "waw.pl", "biz.pl",
    // Turkey
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "mil.tr", "bel.tr",
    "av.tr", "dr.tr", "pol.tr", "k12.tr", "name.tr", "gen.tr", "web.tr", "tv.tr",
    // Colombia
    "com.co", "net.co", "org.co", "gov.co", "edu.co", "mil.co", "nom.co",
    // Venezuela
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve", "mil.ve", "web.ve", "co.ve", "info.ve",
    // Egypt
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg", "mil.eg", "name.eg", "eun.eg",
    // Nigeria
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "sch.ng", "name.ng", "mobi.ng", "i.ng",
    // Kenya
    "co.ke", "ne.ke", "or.ke", "go.ke", "ac.ke", "sc.ke", "me.ke", "mobi.ke", "info.ke",
    // Saudi Arabia
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "pub.sa", "sch.sa",
    // Pakistan
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "fam.pk", "biz.pk", "web.pk", "gok.pk",
    // Bangladesh
    "com.bd", "net.bd", "org.bd", "gov.bd", "edu.bd", "ac.bd", "mil.bd",
    // Russia (legacy geo suffixes)
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    // Greece
    "com.gr", "net.gr", "org.gr", "gov.gr", "edu.gr",
    // Portugal
    "com.pt", "net.pt", "org.pt", "gov.pt", "edu.pt", "int.pt", "publ.pt", "nome.pt",
    // Spain, France legacy
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr")

  /** Wildcard rule parents (`*.ck` stored as "ck") — registries where
    * EVERY second-level label is itself a public suffix. ICANN-section
    * wildcard rules from the published list: national registries selling
    * only third-level names, plus the Japanese geographic prefectures.
    */
  val WildcardSuffixes: Set[String] = Set(
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg",
    // Japan geographic (city-level) wildcards
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp")

  /** Exception rules (`!www.ck` stored as "www.ck") — hosts carved OUT of
    * a wildcard rule: the public suffix is the exception minus its
    * leftmost label, so the exception host itself is registrable.
    */
  val ExceptionRules: Set[String] = Set(
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp")

  /** Longest label count any rule can match (wildcards match parent+1). */
  private val MaxRuleLabels: Int = (
    MultiLabelSuffixes.iterator.map(_.count(_ == '.') + 1) ++
      WildcardSuffixes.iterator.map(_.count(_ == '.') + 2) ++
      ExceptionRules.iterator.map(_.count(_ == '.') + 1)).max

  /** PSL algorithm over the snapshot: the registrable domain of a
    * (lowercased) `host[:port]` authority. Exception rules prevail (public
    * suffix = exception minus its leftmost label); otherwise the matching
    * rule with the most labels (explicit or wildcard) wins; otherwise the
    * default `*` rule makes every bare TLD a suffix. The registrable
    * domain is the public suffix plus one label; a host that IS a public
    * suffix, or a single label, yields "" (no registrable part — same
    * contract as the old heuristic's single-label case). The port never
    * rides along.
    */
  def registrableDomain(hostPort: String): String = {
    val colon = hostPort.indexOf(':')
    val host0 = if (colon >= 0) hostPort.substring(0, colon) else hostPort
    // FQDN trailing dot: 'co.uk.' must behave exactly like 'co.uk' — the
    // split-labels path drops the empty label but the whole-host suffix
    // check would miss, yielding a bogus registrable domain
    val host = if (host0.endsWith(".")) host0.substring(0, host0.length - 1) else host0
    if (host.isEmpty) return ""
    val labels = host.split('.')
    if (labels.length < 2 || labels.exists(_.isEmpty)) return ""
    val n = labels.length
    def tail(k: Int): String = labels.takeRight(k).mkString(".")
    // exception rules take absolute priority (PSL: "If more than one rule
    // matches, the prevailing rule is the one which is an exception rule")
    var ps = -1
    var k = math.min(n, MaxRuleLabels)
    while (k >= 2 && ps < 0) {
      if (ExceptionRules.contains(tail(k))) ps = k - 1
      k -= 1
    }
    if (ps < 0) {
      // longest matching rule: explicit multi-label entry, or a wildcard
      // whose parent is the (k-1)-label tail (the `*` consumes label k)
      ps = 1 // default `*` rule: the bare TLD
      k = math.min(n, MaxRuleLabels)
      while (k >= 2 && ps == 1) {
        if (MultiLabelSuffixes.contains(tail(k)) ||
            WildcardSuffixes.contains(tail(k - 1))) ps = k
        k -= 1
      }
    }
    if (n <= ps) "" else tail(ps + 1)
  }
}
