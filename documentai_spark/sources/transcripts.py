"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Produces the input table mandated by BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)`` — seeded, reproducible, no external data. Content kinds and
edge cases mirror the reference's fixture semantics:

- plain  (~50%): prose seeded from the reference's text fixtures' *shape*
  (entity snippets like ``PO NUMBER <X> DATED dd.mm.yyyy``,
  ``USD 19,555.00``, incoterms — extractor/purchase_order.py:13-76).
- html   (~30%): main-content paragraphs + boilerplate nav/footer link
  lists + tables with 2-cell and 3-cell rows
  (extractor/lc_application.py:14-37 shapes).
- layout (~20%): blank-line-separated blocks with >= 2-space multi-column
  table rows (entity-extraction-service/app.py:831-851 delimiter) incl.
  the 6-field goods rows of performa_invoice.py:44-64.
- edge cases (fixed ~5%): empty text, whitespace-only (blank-page ->
  "re-scan" hard-blocker path, quality_config.py:109-116), text shorter
  than 5 chars (documentClassifier.py:394 min-length), very long turns,
  pure-boilerplate HTML, single-cell tables.
- skew: ~1% of conversations are "mega" (hundreds-thousands of turns) —
  exercises the salted repartition required by ``north_rule``.

Generation is hash-driven (not sequential RNG) so any turn's content is a
pure function of (seed, conv_id, turn_idx) — rows can be generated in any
order / any partitioning and still be identical.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import itertools

_BASE_TS = _dt.datetime(2024, 1, 1, 0, 0, 0)

_WORDS = (
    "shipment invoice beneficiary applicant credit documentary tolerance "
    "merchandise inspection certificate origin freight vessel port lading "
    "negotiation reimbursement drawee confirmation presentation discrepancy "
    "amendment expiry latest goods packing weight gross net carton pallet "
    "the of and to in for with by on at from under against within means"
).split()

_ROLES = ("user", "assistant", "tool")
_TOOLS = ("search", "extract", "classify", "validate", "")

_INCOTERMS = ("CFR", "CIF", "FOB", "DAP", "EXW")
_CURRENCIES = ("USD", "EUR", "GBP", "JPY", "INR")


def _h(seed: int, *parts) -> int:
    """Stable 64-bit hash of (seed, *parts)."""
    m = hashlib.md5(("|".join(str(p) for p in (seed,) + parts)).encode())
    return int.from_bytes(m.digest()[:8], "big")


def _words(h: int, n: int) -> list[str]:
    return [_WORDS[(h + i * 2654435761) % len(_WORDS)] for i in range(n)]


def _sentence(seed: int, conv: str, turn: int, tag: str, n: int) -> str:
    ws = _words(_h(seed, conv, turn, tag), n)
    return " ".join(ws)


def _entity_snippets(h: int) -> list[str]:
    """Recognizable entity lines (FIXTURES.md generator rules)."""
    out = []
    if h % 3 == 0:
        out.append("PO NUMBER PO-%05d DATED %02d.%02d.2024"
                   % (h % 100000, 1 + h % 28, 1 + (h // 31) % 12))
    if h % 4 == 0:
        # month index from h//4, NOT h: under the h%4==0 gate h is even,
        # so h%6 could only ever hit Jan/Mar/May (r7 review — half the
        # month-name alternatives were unreachable in the whole corpus)
        out.append("PI No PI/%04d Date %d-%s-2024"
                   % (h % 10000, 1 + h % 28,
                      ("Jan", "Feb", "Mar", "Apr", "May", "Jun")
                      [(h // 4) % 6]))
    if h % 2 == 0:
        out.append("total amount %s %d,%03d.00"
                   % (_CURRENCIES[h % 5], 1 + h % 99, h % 1000))
    if h % 5 == 0:
        # index from h//5: under the gate h%5 is always 0, so every
        # delivery-terms line in the corpus was 'CFR' and four of five
        # incoterm alternatives were structurally untested (r7 review)
        out.append("delivery terms %s destination port"
                   % _INCOTERMS[(h // 5) % 5])
    if h % 7 == 0:
        out.append("contact buyer-%d@example.com for queries" % (h % 100))
    return out


def _gen_plain(seed: int, conv: str, turn: int) -> str:
    h = _h(seed, conv, turn, "plain")
    parts = [_sentence(seed, conv, turn, "s%d" % i, 8 + (h >> i) % 9)
             for i in range(2 + h % 3)]
    parts.extend(_entity_snippets(h))
    return ". ".join(parts) + "."


def _gen_html(seed: int, conv: str, turn: int) -> str:
    h = _h(seed, conv, turn, "html")
    nav_links = "".join(
        '<li><a href="/%s">%s</a></li>' % (w, w)
        for w in _words(h, 3 + h % 3))
    paras = []
    for i in range(1 + h % 3):
        body = _sentence(seed, conv, turn, "hp%d" % i, 14 + (h >> (i + 2)) % 10)
        snip = _entity_snippets(_h(seed, conv, turn, "hs%d" % i))
        if snip:
            body += " " + " ".join(snip)
        paras.append("<p>%s</p>" % body)
    rows = []
    ncols = 2 + h % 2
    for r in range(1 + h % 3):
        cells = "".join("<td>%s</td>" %
                        _sentence(seed, conv, turn, "c%d_%d" % (r, c), 1 + (h >> c) % 3)
                        for c in range(ncols))
        rows.append("<tr>%s</tr>" % cells)
    table = "<table>%s</table>" % "".join(rows) if h % 3 else ""
    footer = '<div><a href="/about">about</a> <a href="/terms">terms</a></div>'
    heading = "<h1>%s</h1>" % _sentence(seed, conv, turn, "h1", 3) if h % 2 else ""
    return ("<html><body><ul>%s</ul>%s%s%s%s</body></html>"
            % (nav_links, heading, "".join(paras), table, footer))


def _gen_layout(seed: int, conv: str, turn: int) -> str:
    h = _h(seed, conv, turn, "layout")
    blocks = []
    for b in range(1 + h % 3):
        lines = [_sentence(seed, conv, turn, "l%d_%d" % (b, i), 5 + (h >> i) % 6)
                 for i in range(1 + (h >> b) % 3)]
        blocks.append("\n".join(lines))
    # goods table: 6-field rows (performa_invoice.py:44-64), >=2-space gaps
    rows = []
    for r in range(1 + h % 4):
        g = _h(seed, conv, turn, "g%d" % r)
        rows.append("%s  %04d.%02d  %d  PCS  %d.%02d  %d,%03d.00"
                    % (_sentence(seed, conv, turn, "gd%d" % r, 2),
                       g % 10000, g % 100, 1 + g % 500,
                       1 + g % 90, g % 100, 1 + g % 99, g % 1000))
    blocks.append("Description  HS Code  Qty  Unit  Unit Price  Amount")
    blocks.append("\n".join(rows))
    snip = _entity_snippets(h)
    if snip:
        blocks.append("\n".join(snip))
    return "\n\n".join(blocks)


def gen_text(seed: int, conv: str, turn: int) -> str:
    """The turn payload: pure function of (seed, conv_id, turn_idx)."""
    h = _h(seed, conv, turn, "kind")
    e = h % 100
    if e == 0:
        return ""                         # empty
    if e == 1:
        return "   \n\t  \n   "           # whitespace-only -> re-scan path
    if e == 2:
        return "ok"                       # < min length 5
    if e == 3:                            # very long plain turn
        return " ".join(_words(h, 20000))
    if e == 4:                            # pure-boilerplate HTML
        return ('<html><body><ul>' +
                "".join('<li><a href="/%s">%s</a></li>' % (w, w)
                        for w in _words(h, 6)) +
                '</ul><div><a href="/x">x</a></div></body></html>')
    if e == 5:                            # single-cell table
        return "<table><tr><td>%s</td></tr></table>" % \
            _sentence(seed, conv, turn, "sc", 2)
    k = h % 10
    if k < 5:
        return _gen_plain(seed, conv, turn)
    if k < 8:
        return _gen_html(seed, conv, turn)
    return _gen_layout(seed, conv, turn)


def conv_lengths(seed: int, n_convs: int, mega_every: int = 100,
                 mega_turns: int = 2000) -> list[tuple[str, int]]:
    """(conv_id, n_turns) list; ~1/mega_every convs are mega (skew shape)."""
    out = []
    for i in range(n_convs):
        conv = "conv-%06d" % i
        if mega_every and i % mega_every == mega_every - 1:
            n = mega_turns
        else:
            n = 5 + _h(seed, conv, "len") % 46   # 5..50
        out.append((conv, n))
    return out


def gen_rows(seed: int, n_convs: int, mega_every: int = 100,
             mega_turns: int = 2000):
    """Yield row dicts for the transcripts table."""
    for conv, n in conv_lengths(seed, n_convs, mega_every, mega_turns):
        for t in range(n):
            h = _h(seed, conv, t, "meta")
            role = _ROLES[t % 3 if t < 2 else h % 3]
            tool = _TOOLS[h % 4] if role == "tool" else ""
            yield {
                "conv_id": conv,
                "turn_idx": t,
                "role": role,
                "text": gen_text(seed, conv, t),
                "tool": tool,
                "ts": _BASE_TS + _dt.timedelta(seconds=t),
            }


def write_transcripts_parquet(path: str, seed: int = 42, n_convs: int = 200,
                              mega_every: int = 100, mega_turns: int = 2000,
                              rows_per_file: int = 50000) -> int:
    """Write the synthetic table as parquet (driver-side, pyarrow).

    Partitioned into multiple files so Spark gets parallel input splits.
    Returns total row count.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(path, exist_ok=True)
    schema = pa.schema([
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ])
    total = 0
    it = gen_rows(seed, n_convs, mega_every, mega_turns)
    for file_idx in itertools.count():
        chunk = list(itertools.islice(it, rows_per_file))
        if not chunk:
            break
        cols = {k: [r[k] for r in chunk] for k in schema.names}
        table = pa.Table.from_pydict(cols, schema=schema)
        pq.write_table(table, os.path.join(path, "part-%05d.parquet" % file_idx))
        total += len(chunk)
    return total
