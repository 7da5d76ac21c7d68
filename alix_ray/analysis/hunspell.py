"""Vocabulary-restricted Hunspell-style dictionary + root lookup.

Reference parity (behavioral, from-scratch implementation):

- ``HunspellCompiler.java:77-210`` — build-time: prune canonical
  ``.dic`` streams to the indexed vocabulary, annotate each kept line
  with the term's field frequency as ``fr:``, fold apostrophe variants
  to the ASCII apostrophe the analyzer indexes, write the sidecar pair
  ``<field>.dic`` / ``<field>.aff`` (aff copied verbatim), and list
  the uncovered field terms most-frequent-first (``unknowns``).
- ``snippets/SpanQueryParser.java:463-520`` — query-time: for an exact
  single-word term, prefer INDEXED Hunspell roots (OR over them);
  otherwise fall back to the indexed surface form; drop the term when
  neither exists.

The root lookup itself is a deliberately small Hunspell subset:
headword match plus single-application SFX/PFX rules (strip / add /
condition), no compounding or two-fold affixes — enough for French
inflection (plural ``-s/-x``, feminine ``-e``, verb endings) and fully
deterministic.  The reference ships Lucene's full Hunspell engine fed
by a 500k-entry dictionary that is a stripped blob in this copy; the
built-in mini dictionary below stands in for it with the same file
formats, so a real ``fr.dic``/``fr.aff`` drops in unchanged.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

_APOS_VARIANTS = "’ʼ′"  # ’ ʼ ′ → '


def _fold_apos(s: str) -> str:
    for ch in _APOS_VARIANTS:
        s = s.replace(ch, "'")
    return s


def _headword(line: str) -> str | None:
    """Extract the headword of one .dic line (HunspellCompiler.java:
    headword runs to the first '/' or the first whitespace beginning a
    morph field like ``po:``; multi-word entries survive)."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    slash = line.find("/")
    if slash >= 0:
        head = line[:slash]
    else:
        m = re.search(r"\s+[a-z]{2}:", line)
        head = line[: m.start()] if m else line
    head = head.strip()
    return _fold_apos(head) or None


@dataclass
class AffixRule:
    flag: str
    strip: str
    add: str
    cond: re.Pattern  # anchored on the relevant end of the ROOT


class RootDictionary:
    """Headword set + affix rules; ``get_roots`` mirrors Lucene
    ``Hunspell.getRoots`` for the single-affix case: the surface form
    itself when it is a headword, then each root reachable by reverse-
    applying one suffix/prefix rule whose flag the headword carries."""

    def __init__(self, dic_lines, aff_lines):
        self.flags: dict[str, frozenset] = {}
        for line in dic_lines:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if re.fullmatch(r"\d+", line):
                continue  # count header
            head = _headword(line)
            if head is None:
                continue
            slash = line.find("/")
            fl = ""
            if slash >= 0:
                rest = line[slash + 1 :]
                fl = rest.split()[0] if rest.split() else ""
            self.flags[head] = frozenset(fl)
        self.sfx: list[AffixRule] = []
        self.pfx: list[AffixRule] = []
        self._parse_aff(aff_lines)

    def _parse_aff(self, aff_lines) -> None:
        for line in aff_lines:
            parts = line.split()
            if len(parts) >= 5 and parts[0] in ("SFX", "PFX"):
                kind, flag, strip, add = parts[0], parts[1], parts[2], parts[3]
                if add in ("Y", "N") and len(parts) == 4:
                    continue  # header line
                cond = parts[4]
                if strip == "0":
                    strip = ""
                if add == "0":
                    add = ""
                add = add.split("/")[0]  # continuation flags ignored
                try:
                    pat = re.compile(
                        (cond + "$") if kind == "SFX" else ("^" + cond)
                    )
                except re.error:
                    continue
                rule = AffixRule(flag, strip, add, pat)
                (self.sfx if kind == "SFX" else self.pfx).append(rule)

    def is_headword(self, word: str) -> bool:
        return _fold_apos(word) in self.flags

    def get_roots(self, word: str) -> list[str]:
        """Candidate roots in deterministic order (surface headword
        first, then rule order), deduplicated."""
        word = _fold_apos(word)
        out: list[str] = []
        if word in self.flags:
            out.append(word)
        for r in self.sfx:
            if r.add and not word.endswith(r.add):
                continue
            root = word[: len(word) - len(r.add)] + r.strip if r.add else (
                word + r.strip
            )
            if not root or root == word:
                continue
            fl = self.flags.get(root)
            if fl is None or r.flag not in fl:
                continue
            if r.cond.search(root) and root not in out:
                out.append(root)
        for r in self.pfx:
            if r.add and not word.startswith(r.add):
                continue
            root = r.strip + word[len(r.add) :]
            if not root or root == word:
                continue
            fl = self.flags.get(root)
            if fl is None or r.flag not in fl:
                continue
            if r.cond.search(root) and root not in out:
                out.append(root)
        return out


# ---------------------------------------------------------------------
# Build-time compiler (HunspellCompiler.compile / unknowns analog)
# ---------------------------------------------------------------------


def compile_restricted(dic_lines, aff_text: str, term_cf: dict,
                       out_dir: str, field: str = "text") -> int:
    """Prune ``dic_lines`` to headwords present in ``term_cf`` (the
    indexed vocabulary with frequencies), annotate kept lines with
    ``fr:<count>``, and write ``<field>.dic`` / ``<field>.aff`` under
    ``out_dir``.  Returns the number of kept lines; writes nothing and
    removes stale sidecars when nothing is covered."""
    kept: list[str] = []
    for raw in dic_lines:
        line = raw.rstrip("\n")
        stripped = line.strip()
        if not stripped or re.fullmatch(r"\d+", stripped):
            continue
        head = _headword(line)
        if head is None or head not in term_cf:
            continue
        line = _fold_apos(line)
        line = re.sub(r"\s+fr:\S+", "", line)
        kept.append(f"{line} fr:{int(term_cf[head])}")
    dic_path = os.path.join(out_dir, f"{field}.dic")
    aff_path = os.path.join(out_dir, f"{field}.aff")
    if not kept:
        for p in (dic_path, aff_path):
            if os.path.exists(p):
                os.remove(p)
        return 0
    os.makedirs(out_dir, exist_ok=True)
    with open(dic_path, "w") as f:
        f.write(f"{len(kept)}\n")
        f.write("\n".join(kept) + "\n")
    with open(aff_path, "w") as f:
        f.write(aff_text)
    return len(kept)


def unknowns(dic_lines, term_cf: dict) -> list[tuple[str, int]]:
    """Field terms no dictionary headword covers, most frequent first
    (HunspellCompiler.unknowns — the review listing)."""
    heads = set()
    for line in dic_lines:
        h = _headword(line)
        if h:
            heads.add(h)
    out = [(t, int(c)) for t, c in term_cf.items() if _fold_apos(t) not in heads]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def load_sidecars(side_dir: str, field: str = "text") -> RootDictionary | None:
    """FlucText.hunspell() analog: None when neither sidecar exists,
    error when only one does, else the loaded dictionary."""
    dic_path = os.path.join(side_dir, f"{field}.dic")
    aff_path = os.path.join(side_dir, f"{field}.aff")
    dic_ok, aff_ok = os.path.isfile(dic_path), os.path.isfile(aff_path)
    if not dic_ok and not aff_ok:
        return None
    if dic_ok != aff_ok:
        raise ValueError(
            f"incomplete Hunspell sidecar pair for field {field!r} in "
            f"{side_dir}: need both {field}.dic and {field}.aff"
        )
    with open(dic_path) as f:
        dic = f.read().splitlines()
    with open(aff_path) as f:
        aff = f.read().splitlines()
    return RootDictionary(dic, aff)


# Mini built-in French resources standing in for the canonical
# dictionary (a stripped blob in the reference copy) — same formats.
MINI_FR_AFF = """SET UTF-8
SFX S Y 2
SFX S 0 s [^sxz]
SFX S 0 x [au]
SFX F Y 1
SFX F 0 e [^e]
SFX V Y 4
SFX V er e er
SFX V er es er
SFX V er ent er
SFX V er ez er
"""

MINI_FR_DIC = """8
chat/S
cheval/S
analyse/S
grand/SF
parler/V
table/S
beau/S
petit/SF
"""


def _edit_distance_capped(a: str, b: str, cap: int = 2) -> int:
    """Levenshtein with early exit past ``cap`` (banded DP)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        best = cur[0]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
            if cur[j] < best:
                best = cur[j]
        if best > cap:
            return cap + 1
        prev = cur
    return prev[lb]


def spell_suggest(word: str, term_cf: dict, k: int = 10,
                  max_distance: int = 2) -> list[tuple[str, int, int]]:
    """Spelling suggestions against the INDEXED vocabulary (the
    SpellSugg CLI analog, SURVEY §3.3): vocabulary terms within
    ``max_distance`` diacritic-folded edits, ranked by (distance asc,
    frequency desc, term asc).  Returns (term, distance, cf) rows.

    Restricting candidates to the corpus vocabulary (not a canonical
    dictionary) is the vocabulary-restricted principle of the Hunspell
    sidecar: never suggest a word the index cannot find."""
    from ..ops.analytics import fold_ascii

    fw = fold_ascii(word)
    out = []
    for t, cf in term_cf.items():
        d = _edit_distance_capped(fw, fold_ascii(t), max_distance)
        if d <= max_distance:
            out.append((t, d, int(cf)))
    out.sort(key=lambda x: (x[1], -x[2], x[0]))
    return out[:k]
