"""Formula-recognition scalar path: LaTeX normalization.

normalize_latex reimplements the reference's port of the public LaTeX-OCR
post_process (/root/reference/src/processors/formula_preprocess.rs:269-374,
itself "a direct port of the Python implementation
formula_recognition/processors.py"):

  1. unwrap \\text{...} groups that contain CJK characters; strip quotes;
  2. collapse spaces inside \\operatorname/\\mathrm/\\text/\\mathbf{...};
  3. iteratively remove spaces between (noletter, noletter), (noletter,
     letter) and (letter, noletter) pairs — "\\ " (escaped space) kept —
     until a fixed point (the reference caps at 10 iterations).
"""

from __future__ import annotations

import re

_CJK_TEXT_RE = re.compile(r"\\text\s*\{([^{}]*[\u4e00-\u9fff]+[^{}]*)\}")
_CMD_RE = re.compile(r"(\\(operatorname|mathrm|text|mathbf)\s?\*?\s*\{.*?\})")
# the reference's char loop tests is_ascii_alphabetic, so ANYTHING non-ASCII-
# alphabetic (including CJK) counts as a non-letter — broader than the Python
# original's [\W_^\d], and the behavior we mirror
_NOLETTER = r"[^a-zA-Z]"
_LETTER = r"[a-zA-Z]"
_NN_RE = re.compile(rf"(?!\\ )({_NOLETTER})\s+?({_NOLETTER})")
_NL_RE = re.compile(rf"(?!\\ )({_NOLETTER})\s+?({_LETTER})")
_LN_RE = re.compile(rf"({_LETTER})\s+?({_NOLETTER})")


def normalize_latex(latex: str) -> str:
    s = _CJK_TEXT_RE.sub(lambda m: m.group(1), latex)
    s = s.replace('"', "")

    names = [m.group(0).replace(" ", "") for m in _CMD_RE.finditer(s)]
    if names:
        it = iter(names)
        s = _CMD_RE.sub(lambda _m: next(it, ""), s)

    prev = None
    for _ in range(10):
        if s == prev:
            break
        prev = s
        s = _NN_RE.sub(r"\1\2", s)
        s = _NL_RE.sub(r"\1\2", s)
        s = _LN_RE.sub(r"\1\2", s)
    return s.strip()
