package graft.operators

/** Bundled static subset of the Public Suffix List (publicsuffix.org —
  * public, Mozilla-maintained data): the multi-label suffixes under which
  * registrations actually happen, so eTLD+1 normalization keeps THREE
  * labels (`example.co.uk`) instead of collapsing a whole country registry
  * to its suffix (`co.uk`). Single-label TLDs need no table — the
  * two-label rule is exact for them.
  *
  * Since r14 all THREE PSL rule CLASSES are expressed (they were the r13
  * semantics gap — the engine could only say "two-label suffix"):
  *   - NORMAL rules ([[MultiLabel]] 2-label ICANN + [[Private2]] hosting
  *     providers + [[Normal3]] 3-label entries like `k12.ca.us`): the rule
  *     itself is the public suffix → keep rule-labels + 1.
  *   - WILDCARD rules (`*.ck`, `*.kawasaki.jp`, `*.compute.amazonaws.com`
  *     — [[WildcardBase1]]/[[WildcardBase2]]/[[WildcardBase3]] hold the
  *     base under the `*`): EVERY child label of the base is itself a
  *     public suffix → keep base-labels + 2.
  *   - EXCEPTION rules (`!www.ck`, `!city.kawasaki.jp` —
  *     [[Exception2]]/[[Exception3]]): the named host is registrable
  *     DESPITE matching a wildcard → keep exactly the rule's labels.
  * PSL precedence — exceptions beat everything, then longest rule wins —
  * is encoded as the ORDER of [[RuleChain]]; the Column form
  * ([[Sampling.registrableDomain]]), the SQL-function Catalyst tree
  * (`GraftExtensions`), and the DuckDB oracle CASE ([[sqlDomainCase]])
  * are ALL generated from that one chain, so the three surfaces cannot
  * drift. At plan time each set is an O(1) `InSet` membership probe
  * inside whole-stage codegen — table size does not change plan shape;
  * the full 9k-rule PSL drops into the same sets.
  */
object PublicSuffixes {

  /** Two-label public suffixes: a host's REGISTRABLE domain is its last
    * three labels when its last two labels appear here. */
  val MultiLabel: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Japan
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "geek.nz",
    "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz", "health.nz", "mil.nz", "parliament.nz",
    // South Africa
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za", "edu.za",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br", "blog.br",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "gov.in",
    "ac.in", "edu.in", "res.in", "mil.in", "nic.in",
    // South Korea
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr", "re.kr", "pe.kr", "mil.kr",
    "kg.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr",
    // Mexico
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    // Argentina
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar", "tur.ar",
    // Turkey
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "mil.tr", "bbs.tr",
    "av.tr", "bel.tr", "dr.tr", "gen.tr", "info.tr", "k12.tr", "name.tr",
    "pol.tr", "tel.tr", "tv.tr", "web.tr",
    // Singapore
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    // Hong Kong
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    // Taiwan
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw", "club.tw",
    "ebiz.tw", "game.tw", "mil.tw",
    // Malaysia
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my", "name.my",
    // Indonesia
    "co.id", "or.id", "net.id", "web.id", "ac.id", "go.id", "sch.id",
    "mil.id", "my.id", "biz.id", "desa.id", "ponpes.id",
    // Thailand
    "co.th", "in.th", "or.th", "ac.th", "go.th", "net.th", "mi.th",
    // Ukraine
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    // Poland
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "mil.pl", "biz.pl",
    "info.pl", "waw.pl", "wroc.pl", "krakow.pl", "poznan.pl", "gda.pl",
    // Russia
    "com.ru", "msk.ru", "spb.ru",
    // Israel
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il", "k12.il", "idf.il",
    // Egypt
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg", "eun.eg", "mil.eg",
    // Saudi Arabia
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "pub.sa", "sch.sa",
    // United Arab Emirates
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    // Philippines
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph", "mil.ph", "i.ph",
    // Vietnam
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    // Colombia / Chile / Peru / Venezuela / Ecuador / Uruguay / Bolivia / Paraguay
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "gob.cl", "gov.cl", "mil.cl", "co.cl",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve", "co.ve",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "mil.ec", "fin.ec",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "mil.bo",
    "com.py", "net.py", "org.py", "edu.py", "gov.py", "mil.py", "coop.py",
    // Nigeria / Kenya / Ghana / Tanzania / Uganda
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "sch.ng", "name.ng", "i.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke", "info.ke",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "co.tz", "or.tz", "ne.tz", "go.tz", "ac.tz", "sc.tz", "hotel.tz", "info.tz", "tv.tz",
    "co.ug", "or.ug", "ne.ug", "go.ug", "ac.ug", "sc.ug",
    // Misc high-traffic ccTLD registries
    "co.at", "or.at", "ac.at", "gv.at",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt", "org.pt", "publ.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "co.hu", "org.hu", "info.hu", "priv.hu", "tm.hu", "sport.hu",
    "com.se", "org.se", "pp.se", "tm.se",
    "co.no", "priv.no",
    "com.de",
    "co.ir", "net.ir", "org.ir", "ac.ir", "gov.ir", "id.ir", "sch.ir",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "gob.pk", "gok.pk", "gop.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd", "mil.bd",
    "com.lk", "net.lk", "org.lk", "edu.lk", "gov.lk", "sch.lk", "ac.lk",
    "com.np", "net.np", "org.np", "edu.np", "gov.np", "mil.np", "aero.np",
    "com.kh", "net.kh", "org.kh", "edu.kh", "gov.kh", "mil.kh", "per.kh",
    "com.mm", "net.mm", "org.mm", "edu.mm", "gov.mm",
    "com.et", "net.et", "org.et", "edu.et", "gov.et", "biz.et", "info.et", "name.et")

  /** PRIVATE-section 2-label suffixes (hosting providers — the
    * highest-impact gap for real crawl capping flagged in review r13:
    * without these, all of GitHub Pages or Blogspot counts as ONE domain
    * and a per-domain cap deletes almost all of it). Entries verbatim
    * from the PSL PRIVATE section. */
  val Private2: Seq[String] = Seq(
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "blogspot.de", "blogspot.fr", "blogspot.in", "blogspot.jp",
    "appspot.com", "herokuapp.com", "firebaseapp.com", "web.app",
    "netlify.app", "vercel.app", "pages.dev", "workers.dev",
    "azurewebsites.net", "cloudfront.net", "wordpress.com", "tumblr.com",
    "wixsite.com")

  /** 3-label NORMAL rules: US locality registries (`k12.<state>.us` etc.,
    * ICANN section), Australian state school registries, and the 3-label
    * Blogspot ccTLD variants (PRIVATE section). */
  val Normal3: Seq[String] = Seq(
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.fl.us", "k12.il.us",
    "k12.wa.us", "k12.ma.us", "k12.pa.us", "k12.oh.us", "k12.mi.us",
    "cc.ca.us", "cc.ny.us", "cc.tx.us", "lib.ca.us", "lib.ny.us", "lib.tx.us",
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au",
    "blogspot.co.uk", "blogspot.com.au", "blogspot.com.br", "blogspot.co.nz",
    "s3.amazonaws.com")

  /** Bases of 1-label wildcard rules (`*.ck` → base `ck`): every direct
    * child of the base is itself a public suffix. */
  val WildcardBase1: Seq[String] = Seq("ck", "er", "fk", "jm", "pg")

  /** Bases of 2-label wildcard rules (`*.kawasaki.jp` — the Japanese
    * designated-city registries, each with a `!city.*` exception). */
  val WildcardBase2: Seq[String] = Seq(
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp")

  /** Bases of 3-label wildcard rules (PRIVATE section AWS hosting:
    * `*.compute.amazonaws.com` — every EC2 public hostname is its own
    * registrable domain). */
  val WildcardBase3: Seq[String] = Seq(
    "compute.amazonaws.com", "compute-1.amazonaws.com", "elb.amazonaws.com")

  /** 2-label EXCEPTION rules (`!www.ck`): registrable despite `*.ck`. */
  val Exception2: Seq[String] = Seq("www.ck")

  /** 3-label EXCEPTION rules (`!city.kawasaki.jp` family). */
  val Exception3: Seq[String] = Seq(
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp", "city.yokohama.jp")

  /** The complete matcher as (matchLabels, ruleSet, keepLabels) arms in
    * PSL-precedence order (exceptions first, then longest rule): a host
    * whose last `matchLabels` labels are in `ruleSet` normalizes to its
    * last `keepLabels` labels; the first matching arm wins; no match →
    * the 2-label default. All three evaluation surfaces (Column,
    * Catalyst SQL function, DuckDB oracle CASE) are generated from THIS
    * list — edit rules here only. */
  lazy val RuleChain: Seq[(Int, Seq[String], Int)] = Seq(
    (3, Exception3, 3),              // !city.kawasaki.jp → city.kawasaki.jp
    (2, Exception2, 2),              // !www.ck → www.ck
    (3, WildcardBase3, 5),           // *.compute.amazonaws.com
    (3, Normal3, 4),                 // k12.ca.us, blogspot.co.uk, …
    (2, WildcardBase2, 4),           // *.kawasaki.jp
    (2, MultiLabel ++ Private2, 3),  // co.uk, github.io, …
    (1, WildcardBase1, 3))           // *.ck

  /** The whole [[RuleChain]] as a DuckDB CASE expression. `lastK(k)` must
    * render "the last k labels of the host, joined by '.'" in the
    * caller's CTE vocabulary (hosts shorter than k yield the whole host —
    * matching `substring_index`'s past-the-end behavior on the Spark
    * side). Deterministic output: sets are sorted. */
  def sqlDomainCase(lastK: Int => String): String = {
    val arms = RuleChain.map { case (m, set, keep) =>
      val inList = set.sorted.map(s => s"'$s'").mkString(", ")
      s"WHEN ${lastK(m)} IN ($inList) THEN ${lastK(keep)}"
    }
    s"CASE ${arms.mkString(" ")} ELSE ${lastK(2)} END"
  }
}
