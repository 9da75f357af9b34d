"""Deterministic synthetic crawl world (the sandbox's "web").

Generates, with PySpark (distributed; no driver-side row loops), the
three input tables of FIXTURES.md:

- ``pages_raw``  — Common-Crawl-style pages, exactly the BASELINE.json
  input_hint schema ``(url, warc_ts, html binary, text, lang)``.  The
  ``text`` column is the *golden extracted text*: the engine's
  extraction UDFs must reproduce it byte-for-byte from ``html`` alone.
- ``seeds``      — per-source search entry points (priority queue),
  mirroring the reference's 23-source registry
  (/root/reference/main.py:59-357).
- ``robots``     — per-host politeness rules (allow, crawl-delay budget,
  max_parallel), mirroring per-site max_workers 16–48
  (/root/reference/main.py:65,108) and the robots.txt refusal noted at
  /root/reference/main.py:3.

Four HTML "source families" reproduce the reference's cleansing quirks
(SURVEY.md §2.2 P9/P10): content-div isolation, table-row text, literal
header/footer strips, and error pages; plus base64-PDF docs with an
OCR-fallback path (base/scraper.py:340-379, alagoas.py:104-107).
Everything is a pure function of (seed, source, doc index): stable
across partitioning, parallelism, and reruns.
"""

from __future__ import annotations

import base64
import hashlib
import html as html_mod
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCES = [
    "planalto", "senado", "camara", "conama", "icmbio",
    "acre", "alagoas", "amapa", "amazonas", "bahia", "ceara",
    "distrito-federal", "espirito-santo", "goias", "maranhao",
    "mato-grosso", "mato-grosso-do-sul", "minas-gerais", "para",
    "paraiba", "parana", "rio-de-janeiro", "rio-grande-do-sul",
    "sao-paulo",
]
DISALLOWED_SOURCE = "maranhao"  # robots-refused host (cf. main.py:3)

VOCAB = (
    "lei decreto portaria artigo paragrafo inciso norma estado federal "
    "municipio governo publico oficial diario texto vigencia prazo "
    "disposicao regulamento administracao tributo ambiente saude educacao "
    "seguranca transporte orcamento servidor licitacao contrato convenio "
    "emenda consolidacao revisao sancao promulgacao publicacao retificacao "
    "competencia atribuicao jurisdicao comarca vara recurso"
).split()

NORM_TYPES = ["Lei", "Decreto", "Portaria", "Resolução"]
PAGE_SIZE = 10  # docs listed per search page
ERROR_TEXT = "A página não pode ser exibida"
HEADER_LIT = "GOVERNO DO ESTADO - DIÁRIO OFICIAL"
FOOTER_LIT = "Imprimir | Voltar ao topo"
REVOKED_MARK = "revogado pelo decreto estadual"
# ficha (norm-data) vocabulary — J2 enrichment, sao_paulo.py:202-236
THEMES = (
    "meio ambiente,saúde,educação,tributação,transporte,segurança,"
    "cultura,habitação,agricultura,energia,trabalho,turismo"
).split(",")
KEYWORDS = (
    "licença,imposto,zoneamento,concessão,servidor,orçamento,obra,"
    "fundo,conselho,taxa,programa,convênio,cadastro,registro,multa,prazo"
).split(",")
OCR_TEASER = "Documento disponível apenas em PDF."


def _h(*parts) -> int:
    """Stable 64-bit hash of the parts (synthesis randomness source)."""
    s = ":".join(str(p) for p in parts)
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def n_docs_for(source_idx: int, docs_per_source: int, skew: int) -> int:
    """Host skew by construction: source 0 is `skew`× larger."""
    base = docs_per_source * (skew if source_idx == 0 else 1)
    return base + (source_idx * 7) % 13


def host_of(source: str) -> str:
    return f"www.{source}.leg.br"


def doc_url(source: str, i: int) -> str:
    return f"https://{host_of(source)}/norma/{i}"


def search_url(source: str, page: int) -> str:
    return f"https://{host_of(source)}/busca?page={page}"


_LCG_A = 6364136223846793005
_LCG_C = 1442695040888963407
_M64 = (1 << 64) - 1


def _gen_text(seed: int, source: str, i: int, words_scale: int = 1) -> str:
    """Golden document text: seeded words, '\\n\\n' every 12 words.

    One md5 seeds a 64-bit LCG per document (pure-int word picks) —
    generation cost matters at bench scale (10^5+ docs)."""
    is_pdf = i % 11 == 0 and i > 0
    x = _h(seed, source, i)
    n_words = 8 + x % 12 if is_pdf else (60 + x % 180) * words_scale
    words = []
    nv = len(VOCAB)
    for _ in range(n_words):
        x = (x * _LCG_A + _LCG_C) & _M64
        words.append(VOCAB[(x >> 33) % nv])
    paras, cur = [], []
    for w in words:
        cur.append(w)
        if len(cur) == 12:
            paras.append(" ".join(cur))
            cur = []
    if cur:
        paras.append(" ".join(cur))
    text = "\n\n".join(paras)
    if i % 13 == 0:
        text = f"{REVOKED_MARK} {text}"
    return text


def _doc_meta(source_idx: int, source: str, i: int, text: str) -> dict:
    year = 1990 + (i % 35)
    ntype = NORM_TYPES[i % 4]
    situation = (
        "Revogada" if i % 13 == 0 else "Não consta revogação expressa"
    )
    title = f"{ntype.upper()} Nº {i} DE {year}"
    summary = " ".join(text.replace("\n\n", " ").split()[:8])
    return {
        "year": year, "type": ntype, "situation": situation,
        "title": title, "summary": summary,
    }


def _ficha_fields(family: int, i: int, year: int) -> dict:
    """Deterministic ficha payload for family-0 pages (the sao-paulo
    shape: only that source family publishes a norm-data ficha).  Each
    section is independently present/absent so the extractor's
    absent→None semantics are exercised; values are pure functions of
    (i, year)."""
    if family != 0:
        return {
            "promulgacao": None, "projeto": None,
            "themes": None, "keywords": None,
        }
    prom = (
        f"{1 + i % 28:02d}/{1 + i % 12:02d}/{year}" if i % 5 != 1 else None
    )
    proj = f"PL {i % 997 + 1}" if i % 7 != 2 else None
    themes = (
        [THEMES[(i * 7 + j * 13) % len(THEMES)] for j in range(1 + i % 3)]
        if i % 3 != 1
        else None
    )
    kws = (
        [KEYWORDS[(i * 11 + j * 17) % len(KEYWORDS)] for j in range(1 + i % 4)]
        if i % 4 != 1
        else None
    )
    return {
        "promulgacao": prom, "projeto": proj,
        "themes": themes, "keywords": kws,
    }


def _ficha_html(f: dict) -> str:
    """Render the ficha block the way the source pages carry it."""
    if all(v is None for v in f.values()):
        return ""
    parts = ['<div class="ficha">']
    if f["promulgacao"] is not None:
        parts.append(
            f"<label>Promulgação</label><label>{f['promulgacao']}</label>"
        )
    if f["projeto"] is not None:
        parts.append(f"<label>Projeto</label><label>{f['projeto']}</label>")
    if f["themes"] is not None:
        btns = "".join(
            f"<button>{html_mod.escape(t)}</button>" for t in f["themes"]
        )
        parts.append(f'<label>Temas</label><div class="temas">{btns}</div>')
    if f["keywords"] is not None:
        links = "".join(
            f'<a href="#">{html_mod.escape(k)}</a>' for k in f["keywords"]
        )
        parts.append(
            f'<label>Palavras-chave</label><div class="kw">{links}</div>'
        )
    parts.append("</div>")
    return "".join(parts)


def _paras_html(text: str) -> str:
    esc = html_mod.escape(text)
    return "<p>" + esc.replace("\n\n", "</p><p>") + "</p>"


def _gen_html(source_idx: int, source: str, i: int, text: str, meta: dict) -> str:
    """Family-templated page HTML embedding the golden text."""
    family = source_idx % 4
    is_pdf = family == 0 and i % 11 == 0 and i > 0
    is_error = family == 3 and i % 17 == 0 and i > 0
    meta_tags = (
        f'<meta name="dc.title" content="{html_mod.escape(meta["title"])}">'
        f'<meta name="dc.type" content="{meta["type"]}">'
        f'<meta name="dc.year" content="{meta["year"]}">'
        f'<meta name="dc.summary" content="{html_mod.escape(meta["summary"])}">'
    )
    # family 2 omits the situation meta — the extractor must *infer* it
    # from the REVOKED_MARK regex (P11, parana.py:108-111 semantics)
    if family != 2:
        meta_tags += f'<meta name="dc.situation" content="{meta["situation"]}">'
    head = f"<head><title>{html_mod.escape(meta['title'])}</title>{meta_tags}</head>"
    nav = '<div class="nav"><a href="/">Início</a> | <a href="/busca">Busca</a></div>'
    ficha = _ficha_html(_ficha_fields(family, i, meta["year"]))
    if is_error:
        return f"<html>{head}<body><h1>{ERROR_TEXT}</h1></body></html>"
    if is_pdf:
        b64 = base64.b64encode(text.encode("utf-8")).decode("ascii")
        body = (
            f'{nav}<div id="texto-norma"><p>{OCR_TEASER}</p></div>'
            f'<object id="pdf" type="application/pdf" data="data:application/pdf;base64,{b64}"></object>'
            f"{ficha}<footer>Governo Federal</footer>"
        )
    elif family == 0:
        body = (
            f'{nav}<div id="texto-norma">{_paras_html(text)}</div>'
            f"{ficha}<footer>Governo Federal</footer>"
        )
    elif family == 1:
        rows = "".join(
            f"<tr><td>{html_mod.escape(p)}</td></tr>"
            for p in text.split("\n\n")
        )
        body = (
            f'{nav}<table class="norma">'
            f'<tr class="hdr"><td>Texto da norma</td></tr>{rows}</table>'
        )
    elif family == 2:
        body = (
            f'<div class="texto">{HEADER_LIT}\n\n{html_mod.escape(text)}'
            f"\n\n{FOOTER_LIT}</div>"
        )
    else:  # family 3, non-error
        body = f'{nav}<div id="conteudo">{_paras_html(text)}</div>'
    return f"<html>{head}<body>{body}</body></html>"


def _doc_batches(
    seed: int, docs_per_source: int, skew: int, words_scale: int = 1
) -> "callable":
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_in in batches:
            out = {
                "url": [], "host": [], "source": [], "doc_i": [],
                "year": [], "ntype": [], "situation": [], "title": [],
                "summary": [], "text": [], "html": [], "lang": [],
                "is_error": [], "themes": [], "keywords": [],
                "promulgacao": [], "projeto": [],
            }
            for src_idx, source, i in zip(
                pdf_in["source_idx"], pdf_in["source"], pdf_in["i"]
            ):
                src_idx, i = int(src_idx), int(i)
                text = _gen_text(seed, source, i, words_scale)
                meta = _doc_meta(src_idx, source, i, text)
                html = _gen_html(src_idx, source, i, text, meta)
                family = src_idx % 4
                is_error = family == 3 and i % 17 == 0 and i > 0
                out["url"].append(doc_url(source, i))
                out["host"].append(host_of(source))
                out["source"].append(source)
                out["doc_i"].append(i)
                out["year"].append(meta["year"])
                out["ntype"].append(meta["type"])
                out["situation"].append(meta["situation"])
                out["title"].append(meta["title"])
                out["summary"].append(meta["summary"])
                out["text"].append("" if is_error else text)
                out["html"].append(html.encode("utf-8"))
                out["lang"].append("en" if i % 29 == 7 else "pt")
                out["is_error"].append(is_error)
                fich = _ficha_fields(family, i, meta["year"])
                out["themes"].append(fich["themes"])
                out["keywords"].append(fich["keywords"])
                out["promulgacao"].append(fich["promulgacao"])
                out["projeto"].append(fich["projeto"])
            yield pd.DataFrame(out)

    return gen


_DOC_SCHEMA = (
    "url string, host string, source string, doc_i long, year int, "
    "ntype string, situation string, title string, summary string, "
    "text string, html binary, lang string, is_error boolean, "
    "themes array<string>, keywords array<string>, "
    "promulgacao string, projeto string"
)


def synth_docs(
    spark: SparkSession,
    seed: int = 42,
    docs_per_source: int = 40,
    skew: int = 10,
    n_sources: int = len(SOURCES),
    partitions: int = 32,
    words_scale: int = 1,
) -> DataFrame:
    """All document pages + golden metadata (distributed generation)."""
    rows = [
        (idx, s, n_docs_for(idx, docs_per_source, skew))
        for idx, s in enumerate(SOURCES[:n_sources])
    ]
    src = spark.createDataFrame(rows, "source_idx int, source string, n_docs int")
    ids = src.select(
        "source_idx",
        "source",
        F.explode(F.sequence(F.lit(0), F.col("n_docs") - 1)).alias("i"),
    ).repartition(partitions, "source", "i")
    return ids.mapInPandas(
        _doc_batches(seed, docs_per_source, skew, words_scale),
        schema=_DOC_SCHEMA,
    )


def synth_search_pages(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Search-result pages: PAGE_SIZE doc links each, a 'next' link while
    more pages remain, and the 'Total de registros: N' count probe."""
    # doc_i is dense 0..n-1 per source → page assignment is a cheap map
    # (NOT explode-the-whole-array-per-page, which is quadratic in the
    # mega-host's size); one shuffle keyed by (source, page).
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    paged = (
        docs.withColumn(
            "page", F.floor(F.col("doc_i") / PAGE_SIZE).cast("int")
        )
        .groupBy("source", "host", "page")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_i", "url", "title"))
            ).alias("docs")
        )
        .join(F.broadcast(counts), "source")
    )
    links = F.array_join(
        F.transform(
            F.col("docs"),
            lambda d: F.concat(
                F.lit('<a class="res" href="'),
                d["url"],
                F.lit('">'),
                d["title"],
                F.lit("</a>"),
            ),
        ),
        "\n",
    )
    has_next = (F.col("page") + 1) * PAGE_SIZE < F.col("n_docs")
    next_link = F.when(
        has_next,
        F.concat(
            F.lit('<a class="next" href="https://'),
            F.col("host"),
            F.lit("/busca?page="),
            (F.col("page") + 1).cast("string"),
            F.lit('">Próxima</a>'),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><body><div class="resultados">\n'),
        links,
        F.lit("\n</div>\n"),
        next_link,
        F.lit('\n<span class="total">Total de registros: '),
        F.col("n_docs").cast("string"),
        F.lit("</span></body></html>"),
    )
    return paged.select(
        F.concat(
            F.lit("https://"),
            F.col("host"),
            F.lit("/busca?page="),
            F.col("page").cast("string"),
        ).alias("url"),
        "host",
        "source",
        F.col("page"),
        F.encode(html, "utf-8").alias("html"),
    )


def synth_world(
    spark: SparkSession,
    seed: int = 42,
    docs_per_source: int = 40,
    skew: int = 10,
    n_sources: int = len(SOURCES),
    partitions: int = 32,
    budget_base: int = 2,
    words_scale: int = 1,
) -> dict[str, DataFrame]:
    """pages_raw (input_hint schema), golden_meta, seeds, robots."""
    # cache: docs feeds pages_raw (union), search pages, and golden_meta
    # — without it the generation UDF runs 3×
    docs = synth_docs(
        spark, seed, docs_per_source, skew, n_sources, partitions,
        words_scale,
    ).cache()
    search = synth_search_pages(spark, docs)
    base_ts = F.to_timestamp(F.lit("2024-03-01 00:00:00"))
    doc_pages = docs.select(
        "url",
        (base_ts + F.make_interval(secs=F.col("doc_i"))).alias("warc_ts"),
        "html",
        "text",
        "lang",
    )
    search_pages = search.select(
        "url",
        (base_ts + F.make_interval(secs=F.col("page"))).alias("warc_ts"),
        "html",
        F.lit("").alias("text"),
        F.lit("pt").alias("lang"),
    )
    pages_raw = doc_pages.unionByName(search_pages)
    golden_meta = docs.select(
        F.col("url").alias("document_url"),
        "source", "host", "title", "year",
        F.col("ntype").alias("type"),
        "situation", "summary", "text", "is_error",
        "themes", "keywords", "promulgacao", "projeto",
    )
    srcs = SOURCES[:n_sources]
    seeds = spark.createDataFrame(
        [
            (search_url(s, 0), s, idx, 1990)
            for idx, s in enumerate(srcs)
        ],
        "seed_url string, source string, priority int, year_start int",
    )
    robots = spark.createDataFrame(
        [
            (
                host_of(s),
                s != DISALLOWED_SOURCE,
                1000 + (idx % 5) * 500,
                budget_base + (idx * 3) % 7,
            )
            for idx, s in enumerate(srcs)
        ],
        "host string, allow boolean, crawl_delay_ms long, max_parallel int",
    )
    return {
        "pages_raw": pages_raw,
        "golden_meta": golden_meta,
        "seeds": seeds,
        "robots": robots,
    }


def synth_viewstate_world(
    spark: SparkSession, n_hosts: int = 3, pages_per_host: int = 4
) -> dict:
    """Tiny ASP.NET-postback web (S5, espirito_santo.py:69-127 shape).

    Per host: one .aspx base URL whose GET body carries the
    __VIEWSTATE/__EVENTVALIDATION hidden inputs (deterministic md5
    tokens) plus the page-1 results; pages 2..P exist ONLY under the
    token-bearing postback key, so fetching them requires the
    harvest-then-POST sequence.  Error-path coverage by construction:
    host index 1's base page omits its tokens (reference error branch,
    :92-95) and the last host's final postback row is missing (404
    postback, :124-127).  Returns {"pages_raw": DataFrame,
    "web": dict} — the dict feeds the straight-line parity simulator.
    """
    from .operators.viewstate import EVENT_TARGET_FMT

    web: dict[str, bytes] = {}
    for hi in range(n_hosts):
        url = f"https://www.al-vs{hi}.leg.br/consulta-legislacao.aspx?tipo=1&ano=200{hi}"
        vs = hashlib.md5(url.encode()).hexdigest()
        ev = hashlib.md5((url + "ev").encode()).hexdigest()
        tokens = (
            f'<input id="__VIEWSTATE" value="{vs}"/>'
            f'<input id="__EVENTVALIDATION" value="{ev}"/>'
            if hi != 1
            else ""  # broken host: no tokens on the base page
        )
        page1 = f"<html><body><form>{tokens}<div>resultados p1 h{hi}</div></form></body></html>"
        web[url] = page1.encode()
        for page in range(2, pages_per_host + 1):
            if hi == n_hosts - 1 and page == pages_per_host:
                continue  # missing postback → 404 postback path
            tgt = EVENT_TARGET_FMT.format(idx=page - 1)
            key = f"{url}#postback:{tgt}:{vs}:{ev}"
            web[key] = (
                f"<html><body><div>resultados p{page} h{hi}</div></body></html>"
            ).encode()
    pages_raw = spark.createDataFrame(
        [(u, b) for u, b in web.items()], "url string, html binary"
    )
    return {"pages_raw": pages_raw, "web": web}
