"""Referring-expression caption-metric suite: BLEU / CIDEr / ROUGE-L /
METEOR + a PTB-style tokenizer + the RefEvaluation driver.

reference: tools/refer/evaluation/refEvaluation.py:1-136 and the vendored
scorers (evaluation/bleu/bleu_scorer.py, evaluation/cider/cider_scorer.py,
evaluation/rouge/rouge.py, evaluation/meteor/meteor.py,
evaluation/tokenizer/ptbtokenizer.py). Re-implemented from scratch in pure
Python 3 with the same metric semantics; parity with the reference scorer
code is asserted in tests/test_ref_evaluation.py (the py2 reference
sources are loaded through a mechanical py2->py3 shim and both
implementations are run on the tools/refer/test fixtures).

Two vendored components cannot run even in the reference as shipped,
because the jars they wrap are not in the repo:

* PTB tokenization (ptbtokenizer.py shells out to
  stanford-corenlp-3.4.1.jar): replaced by a pure-Python PTB-style
  tokenizer — lowercase, contraction/possessive splitting, punctuation
  split off and then *removed* per the reference's PUNCTUATIONS list. On
  the short referring expressions this suite evaluates ("man in black"),
  tokenization is the identity for both implementations.
* METEOR (meteor.py pipes to meteor-1.5.jar, absent): replaced by an
  exact-surface-match METEOR (unigram precision/recall harmonic mean with
  fragmentation penalty, classic alpha=0.9 / beta=3 / gamma=0.5
  constants). It lacks the jar's stem/synonym/paraphrase match stages, so
  absolute METEOR values are NOT comparable to jar-produced numbers; the
  substitute is documented here and flagged by ``Meteor.method() ==
  "METEOR"`` for schema parity.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

# ---------------------------------------------------------------------------
# PTB-style tokenizer (reference: evaluation/tokenizer/ptbtokenizer.py)
# ---------------------------------------------------------------------------

# tokens the reference removes after tokenization
PUNCTUATIONS = {
    "''", "'", "``", "`", "-lrb-", "-rrb-", "-lcb-", "-rcb-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
}

_BRACKETS = {"(": "-lrb-", ")": "-rrb-", "{": "-lcb-", "}": "-rcb-",
             "[": "-lsb-", "]": "-rsb-"}

# order matters: multi-char symbols first
_TOKEN_RE = re.compile(
    r"-l[rcs]b-|-r[rcs]b-|n't|'(?:ll|re|ve|s|m|d)\b|\.\.\.|--"
    r"|[a-z0-9]+(?:[.,][0-9]+)*|[^\sa-z0-9]"
)


def ptb_tokenize_sentence(s: str) -> str:
    """Lowercased PTB-style token stream with the reference's punctuation
    tokens removed, joined by single spaces."""
    s = s.replace("\n", " ").lower()
    for br, tok in _BRACKETS.items():
        s = s.replace(br, f" {tok} ")
    # contraction / possessive splitting ("isn't" -> "is n't",
    # "man's" -> "man 's"), as the Stanford tokenizer does
    s = re.sub(r"(?<=[a-z])n't\b", " n't", s)
    s = re.sub(r"'(s|ll|re|ve|m|d)\b", r" '\1", s)
    toks = _TOKEN_RE.findall(s)
    return " ".join(t for t in toks if t not in PUNCTUATIONS)


class PTBTokenizer:
    """API twin of the reference's jar wrapper
    (evaluation/tokenizer/ptbtokenizer.py:24-68)."""

    def tokenize(self, captions_for_key: Dict) -> Dict:
        return {k: [ptb_tokenize_sentence(c) for c in v]
                for k, v in captions_for_key.items()}


# ---------------------------------------------------------------------------
# shared n-gram helpers
# ---------------------------------------------------------------------------

def _ngram_counts(words: Sequence[str], n: int) -> Counter:
    c: Counter = Counter()
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            c[tuple(words[i:i + k])] += 1
    return c


# ---------------------------------------------------------------------------
# BLEU (reference: evaluation/bleu/bleu_scorer.py; wrapper bleu.py uses the
# 'closest' effective-reference-length option)
# ---------------------------------------------------------------------------

_SMALL = 1e-9
_TINY = 1e-15  # so a zero guess still yields 0, as in the reference


class Bleu:
    def __init__(self, n: int = 4):
        self._n = n

    def method(self) -> str:
        return "Bleu"

    def compute_score(self, gts: Dict, res: Dict
                      ) -> Tuple[List[float], List[List[float]]]:
        n = self._n
        ids = list(gts.keys())
        tot = {"testlen": 0.0, "reflen": 0.0,
               "guess": [0.0] * n, "correct": [0.0] * n}
        per: List[List[float]] = [[] for _ in range(n)]
        for rid in ids:
            hyp = res[rid][0].split()
            refs = [r.split() for r in gts[rid]]
            testlen = len(hyp)
            # 'closest' effective reference length (bleu_scorer.py:186-193)
            reflen = min((abs(len(r) - testlen), len(r)) for r in refs)[1]
            guess = [max(0, testlen - k + 1) for k in range(1, n + 1)]
            maxcounts: Dict[tuple, int] = {}
            for r in refs:
                for g, c in _ngram_counts(r, n).items():
                    maxcounts[g] = max(maxcounts.get(g, 0), c)
            correct = [0] * n
            for g, c in _ngram_counts(hyp, n).items():
                correct[len(g) - 1] += min(maxcounts.get(g, 0), c)

            tot["testlen"] += testlen
            tot["reflen"] += reflen
            for k in range(n):
                tot["guess"][k] += guess[k]
                tot["correct"][k] += correct[k]

            # per-sentence scores with the reference's smoothing + brevity
            bleu = 1.0
            for k in range(n):
                bleu *= (correct[k] + _TINY) / (guess[k] + _SMALL)
                per[k].append(bleu ** (1.0 / (k + 1)))
            ratio = (testlen + _TINY) / (reflen + _SMALL)
            if ratio < 1:
                for k in range(n):
                    per[k][-1] *= math.exp(1 - 1 / ratio)

        bleus: List[float] = []
        bleu = 1.0
        for k in range(n):
            bleu *= (tot["correct"][k] + _TINY) / (tot["guess"][k] + _SMALL)
            bleus.append(bleu ** (1.0 / (k + 1)))
        ratio = (tot["testlen"] + _TINY) / (tot["reflen"] + _SMALL)
        if ratio < 1:
            bleus = [b * math.exp(1 - 1 / ratio) for b in bleus]
        return bleus, per


# ---------------------------------------------------------------------------
# CIDEr (reference: evaluation/cider/cider_scorer.py)
# ---------------------------------------------------------------------------

class Cider:
    def __init__(self, n: int = 4, sigma: float = 6.0):
        self._n = n
        self._sigma = sigma

    def method(self) -> str:
        return "CIDEr"

    def compute_score(self, gts: Dict, res: Dict
                      ) -> Tuple[float, List[float]]:
        n, sigma = self._n, self._sigma
        ids = list(gts.keys())
        # document frequency over the reference corpus
        df: Counter = Counter()
        for rid in ids:
            seen = set()
            for ref in gts[rid]:
                seen |= set(_ngram_counts(ref.split(), n))
            df.update(seen)
        ref_len = math.log(float(len(ids)))

        def tfidf(counts: Counter):
            vec = [defaultdict(float) for _ in range(n)]
            norm = [0.0] * n
            length = 0
            for g, tf in counts.items():
                d = math.log(max(1.0, df[g]))
                k = len(g) - 1
                vec[k][g] = tf * (ref_len - d)
                norm[k] += vec[k][g] ** 2
                # the reference counts *bigrams* here (cider_scorer.py:128
                # ``if n == 1`` on the 0-based index) — replicated verbatim
                # for parity
                if k == 1:
                    length += tf
            return vec, [math.sqrt(x) for x in norm], length

        scores: List[float] = []
        for rid in ids:
            hv, hn, hl = tfidf(_ngram_counts(res[rid][0].split(), n))
            acc = [0.0] * n
            for ref in gts[rid]:
                rv, rn, rl = tfidf(_ngram_counts(ref.split(), n))
                delta = float(hl - rl)
                pen = math.exp(-(delta ** 2) / (2 * sigma ** 2))
                for k in range(n):
                    val = sum(min(w, rv[k][g]) * rv[k][g]
                              for g, w in hv[k].items())
                    if hn[k] != 0 and rn[k] != 0:
                        val /= hn[k] * rn[k]
                    acc[k] += val * pen
            score = sum(acc) / n / len(gts[rid]) * 10.0
            scores.append(score)
        mean = sum(scores) / len(scores) if scores else 0.0
        return mean, scores


# ---------------------------------------------------------------------------
# ROUGE-L (reference: evaluation/rouge/rouge.py)
# ---------------------------------------------------------------------------

def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[len(b)]


class Rouge:
    beta = 1.2

    def method(self) -> str:
        return "Rouge"

    def calc_score(self, candidate: List[str], refs: List[str]) -> float:
        hyp = candidate[0].split(" ")
        precs, recs = [], []
        for ref in refs:
            r = ref.split(" ")
            lcs = _lcs_len(r, hyp)
            precs.append(lcs / float(len(hyp)))
            recs.append(lcs / float(len(r)))
        p, r = max(precs), max(recs)
        if p != 0 and r != 0:
            return ((1 + self.beta ** 2) * p * r) / (r + self.beta ** 2 * p)
        return 0.0

    def compute_score(self, gts: Dict, res: Dict
                      ) -> Tuple[float, List[float]]:
        scores = [self.calc_score(res[rid], gts[rid]) for rid in gts]
        mean = sum(scores) / len(scores) if scores else 0.0
        return mean, scores


# ---------------------------------------------------------------------------
# METEOR substitute (see module docstring: the reference's meteor-1.5.jar is
# not vendored, so this exact-match variant stands in)
# ---------------------------------------------------------------------------

class Meteor:
    alpha = 0.9
    beta = 3.0
    gamma = 0.5

    def method(self) -> str:
        return "METEOR"

    def _align(self, hyp: List[str], ref: List[str]) -> Tuple[int, int]:
        """Greedy in-order exact alignment: returns (#matches, #chunks)."""
        used = [False] * len(ref)
        align: List[Tuple[int, int]] = []
        for i, w in enumerate(hyp):
            for j, r in enumerate(ref):
                if not used[j] and r == w:
                    used[j] = True
                    align.append((i, j))
                    break
        m = len(align)
        chunks = 0
        prev = None
        for i, j in align:
            if prev is None or i != prev[0] + 1 or j != prev[1] + 1:
                chunks += 1
            prev = (i, j)
        return m, chunks

    def _single(self, hyp_s: str, ref_s: str) -> float:
        hyp, ref = hyp_s.split(), ref_s.split()
        if not hyp or not ref:
            return 0.0
        m, ch = self._align(hyp, ref)
        if m == 0:
            return 0.0
        p, r = m / len(hyp), m / len(ref)
        fmean = p * r / (self.alpha * p + (1 - self.alpha) * r)
        frag = ch / m
        penalty = self.gamma * frag ** self.beta
        return fmean * (1 - penalty)

    def compute_score(self, gts: Dict, res: Dict
                      ) -> Tuple[float, List[float]]:
        scores = [max(self._single(res[rid][0], ref) for ref in gts[rid])
                  for rid in gts]
        mean = sum(scores) / len(scores) if scores else 0.0
        return mean, scores


# ---------------------------------------------------------------------------
# RefEvaluation driver (reference: evaluation/refEvaluation.py:17-85)
# ---------------------------------------------------------------------------

class RefEvaluation:
    """Evaluate predicted referring expressions against the REFER GTs.

    Outputs mirror the reference: ``eval`` {metric: corpus score},
    ``refToEval`` {ref_id: per-ref scores}, ``evalRefs`` list of the
    per-ref dicts.
    """

    def __init__(self, refer, res: List[Dict]):
        self.refer = refer
        self.Res = res
        self.eval: Dict[str, float] = {}
        self.refToEval: Dict = {}
        self.evalRefs: List[Dict] = []

    def evaluate(self) -> None:
        ref_ids = [ann["ref_id"] for ann in self.Res]
        gts = {}
        for rid in ref_ids:
            ref = self.refer.Refs[rid]
            gts[rid] = [s["sent"].encode("ascii", "ignore").decode("ascii")
                        for s in ref["sentences"]]
        res = {ann["ref_id"]: [ann["sent"]] for ann in self.Res}

        tok = PTBTokenizer()
        self.refToRes = tok.tokenize(res)
        self.refToGts = tok.tokenize(gts)

        scorers = [
            (Bleu(4), ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4"]),
            (Meteor(), "METEOR"),
            (Rouge(), "ROUGE_L"),
            (Cider(), "CIDEr"),
        ]
        for scorer, method in scorers:
            score, scores = scorer.compute_score(self.refToGts, self.refToRes)
            if isinstance(method, list):
                for sc, scs, m in zip(score, scores, method):
                    self._set_eval(sc, m)
                    self._set_ref_scores(scs, list(self.refToGts), m)
            else:
                self._set_eval(score, method)
                self._set_ref_scores(scores, list(self.refToGts), method)
        self.evalRefs = list(self.refToEval.values())

    def _set_eval(self, score: float, method: str) -> None:
        self.eval[method] = score

    def _set_ref_scores(self, scores, ref_ids, method) -> None:
        for rid, score in zip(ref_ids, scores):
            self.refToEval.setdefault(rid, {"ref_id": rid})[method] = score
