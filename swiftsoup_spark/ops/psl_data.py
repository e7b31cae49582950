"""Curated subset of the Public Suffix List (publicsuffix.org).

The PSL is public data (Mozilla, MPL-2.0; the suffix strings themselves
are facts). This module ships the multi-label entries that matter for
registered-domain (eTLD+1) grouping of a web crawl: country-code
second-level registries (``co.uk``, ``com.au``, ``co.jp``, ...), the
US state hierarchy (``ca.us`` + ``k12/cc/lib.<state>.us``), and the
highest-traffic PRIVATE-section hosting suffixes (``github.io``,
``blogspot.com``, ...). Single-label TLDs need no entry — the PSL
default rule ``*`` makes every bare TLD a public suffix, which the
2-label fallback in :func:`ops.urlnorm.registered_domain` already
implements.

Regenerate against the full list with ``scripts/gen_psl.py`` (reads a
downloaded ``public_suffix_list.dat``; this sandbox has no network, so
the curated subset is checked in directly). Documented boundary:
wildcard rules (``*.ck``) and exception rules (``!www.ck``) are not in
the curated subset — hosts under them fall back to 2-label grouping.

At 10^12-row scale both tuples render as literal IN-lists inside one
codegen stage (Catalyst converts large IN to an O(1) InSet hash probe),
so registered-domain extraction stays map-side with zero shuffle and
zero Python — the same "ship the table to the expression" pattern as
``select/scripts_data.py``.
"""

from __future__ import annotations

# -- ICANN section: ccTLD second-level registries (registrations happen
#    one label below these) --------------------------------------------
PSL2 = (
    # United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # Australia
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz",
    "kiwi.nz", "maori.nz", "net.nz", "org.nz", "school.nz",
    # South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    # Brazil
    "adv.br", "art.br", "blog.br", "com.br", "eco.br", "edu.br",
    "emp.br", "eng.br", "esp.br", "far.br", "flog.br", "gov.br",
    "ind.br", "inf.br", "jor.br", "jus.br", "leg.br", "mil.br",
    "net.br", "nom.br", "org.br", "psi.br", "rec.br", "srv.br",
    "tur.br", "tv.br", "vlog.br", "wiki.br",
    # China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    # India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # South Korea
    "ac.kr", "busan.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr",
    "mil.kr", "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    "seoul.kr",
    # Mexico
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    # Argentina
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "musica.ar", "net.ar", "org.ar", "tur.ar",
    # Turkey
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr", "edu.tr",
    "gen.tr", "gov.tr", "info.tr", "k12.tr", "kep.tr", "mil.tr",
    "name.tr", "net.tr", "org.tr", "pol.tr", "tel.tr", "tv.tr", "web.tr",
    # Taiwan
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    # Hong Kong
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    # Singapore
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    # Malaysia
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my",
    "org.my",
    # Indonesia
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
    # Thailand
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    # Philippines
    "com.ph", "edu.ph", "gov.ph", "i.ph", "mil.ph", "net.ph", "ngo.ph",
    "org.ph",
    # Vietnam
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    # Israel
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    # Russia (PSL-listed geographic/legacy SLDs)
    "com.ru", "msk.ru", "net.ru", "org.ru", "pp.ru", "spb.ru",
    # Ukraine
    "com.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua", "kyiv.ua",
    "net.ua", "org.ua",
    # Poland
    "biz.pl", "com.pl", "edu.pl", "gov.pl", "info.pl", "net.pl",
    "org.pl", "waw.pl",
    # Egypt
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    # Saudi Arabia
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa",
    "pub.sa", "sch.sa",
    # United Arab Emirates
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae", "sch.ae",
    # Nigeria
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
    "name.ng", "net.ng", "org.ng", "sch.ng",
    # Kenya
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    # Colombia
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co",
    "org.co",
    # Peru
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe",
    "org.pe",
    # Venezuela
    "co.ve", "com.ve", "edu.ve", "gob.ve", "info.ve", "mil.ve",
    "net.ve", "org.ve", "web.ve",
    # Uruguay
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    # Ecuador
    "com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "info.ec",
    "k12.ec", "med.ec", "mil.ec", "net.ec", "org.ec", "pro.ec",
    # Greece
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    # Portugal
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    # Spain
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    # US states (every <state>.us is a public suffix)
    "ak.us", "al.us", "ar.us", "az.us", "ca.us", "co.us", "ct.us",
    "dc.us", "de.us", "fl.us", "ga.us", "hi.us", "ia.us", "id.us",
    "il.us", "in.us", "ks.us", "ky.us", "la.us", "ma.us", "md.us",
    "me.us", "mi.us", "mn.us", "mo.us", "ms.us", "mt.us", "nc.us",
    "nd.us", "ne.us", "nh.us", "nj.us", "nm.us", "nv.us", "ny.us",
    "oh.us", "ok.us", "or.us", "pa.us", "ri.us", "sc.us", "sd.us",
    "tn.us", "tx.us", "ut.us", "va.us", "vt.us", "wa.us", "wi.us",
    "wv.us", "wy.us",
    # -- PRIVATE section: high-traffic hosting suffixes ----------------
    "blogspot.com", "appspot.com", "firebaseapp.com", "web.app",
    "github.io", "gitlab.io", "herokuapp.com", "netlify.app",
    "vercel.app", "pages.dev", "workers.dev", "azurewebsites.net",
    "cloudapp.net", "cloudfront.net", "wordpress.com", "tumblr.com",
    "neocities.org", "readthedocs.io", "fastly.net", "glitch.me",
    "repl.co", "surge.sh", "onrender.com", "fly.dev",
)

# -- 3-label public suffixes: US locality hierarchies (k12/cc/lib under
#    each state) — curated to the states, same pattern for all ---------
_US_STATES = ("ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de",
              "fl", "ga", "hi", "ia", "id", "il", "in", "ks", "ky",
              "la", "ma", "md", "me", "mi", "mn", "mo", "ms", "mt",
              "nc", "nd", "ne", "nh", "nj", "nm", "nv", "ny", "oh",
              "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx", "ut",
              "va", "vt", "wa", "wi", "wv", "wy")
PSL3 = tuple(
    f"{kind}.{st}.us" for st in _US_STATES for kind in ("k12", "cc", "lib")
) + (
    # PRIVATE section 3-label entries with real crawl presence
    "s3.amazonaws.com", "compute.amazonaws.com", "elb.amazonaws.com",
    "pages.github.io",
)
