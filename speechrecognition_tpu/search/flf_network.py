"""Flf lattice-processor NETWORK: a config-driven dataflow of lattice
operations, plus the posterior/MBR algorithms the nodes need.

TPU-native counterpart of the reference's Flf tool
(rwth-asr-0.5/src/Flf/Network.cc + NodeFactory.cc + NodeRegistration.hh):
the Flf binary parses `[network]` / `[network.<node>]` Sprint-config
blocks into a DAG of typed nodes connected by `links = [port->]name[:port]`
and pulls each segment's data through it. This module implements the
same model — SprintConfig blocks → node DAG → per-segment topological
evaluation — with a registry of node types mapped onto the framework's
lattice ops (search/flf.py, search/lattice.py), exactly as
`sprint/flow.py` does for the Flow feature networks.

Algorithms added here (the high-value Flf absentees):
  * lattice forward/backward posteriors   — Flf/FwdBwd.cc (FB-builder):
    arc −log posteriors + the frame-wise posterior CN (fCN): for every
    frame t, p_t(w) = Σ posteriors of w-labeled arcs covering t.
  * min-fWER / local-cost decoding        — Flf/LocalCostDecoder.cc:
    per-arc risk = expected frame errors against the fCN
    (frame-error risk builder); best path by DP over risks + word
    penalty. Decodes the MBR hypothesis under the local frame-error
    cost instead of the MAP path.
  * gamma correction                      — Flf/GammaCorrection.cc:
    the piecewise-power sharpening gammaCorrectionFunc (breakpoint 0.3)
    applied to CN slot or fCN frame distributions, optionally
    re-normalized.
"""

from __future__ import annotations

import math
import sys
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..sprint.config import SprintConfig
from .flf import (CnSlot, LatticeArchive, cn_decode, confusion_network,
                  determinize_lattice, mesh_lattice, minimize_lattice,
                  pivot_confusion_network, trim_lattice, union_lattices)
from .lattice import Arc, WordLattice


# -- posteriors (Flf/FwdBwd.cc) ----------------------------------------------

def fwdbwd_posteriors(lat: WordLattice) -> Dict[Arc, float]:
    """Arc −log posteriors by lattice forward/backward (FwdBwd.cc
    FwdBwdBuilder; the probability semiring sums live in
    WordLattice.forward_backward)."""
    _nodes, post = lat.forward_backward()
    return post


def frame_posterior_cn(lat: WordLattice,
                       post: Optional[Dict[Arc, float]] = None,
                       ) -> List[Dict[int, float]]:
    """Frame-wise posterior CN (the reference's fCN,
    Flf/ConfusionNetwork.hh PosteriorCn): pcn[t][word] = Σ posterior of
    word-labeled arcs covering frame t. Mass not covered by any arc at t
    is epsilon."""
    if post is None:
        post = fwdbwd_posteriors(lat)
    pcn: List[Dict[int, float]] = [dict() for _ in range(lat.num_frames)]
    for a in lat.arcs:
        p = post.get(a)
        if p is None or not np.isfinite(p):
            continue
        prob = math.exp(-p)
        for t in range(a.start, a.end):
            pcn[t][a.word] = pcn[t].get(a.word, 0.0) + prob
    return pcn


def arc_confidence(lat: WordLattice,
                   post: Optional[Dict[Arc, float]] = None,
                   ) -> Dict[Arc, float]:
    """Per-arc confidence = average frame posterior of the arc's own
    label over its span (Flf add-word-confidence semantics: the fCN
    smoothed confidence)."""
    if post is None:
        post = fwdbwd_posteriors(lat)
    pcn = frame_posterior_cn(lat, post)
    conf: Dict[Arc, float] = {}
    for a in lat.arcs:
        span = max(1, a.end - a.start)
        conf[a] = sum(pcn[t].get(a.word, 0.0)
                      for t in range(a.start, a.end)) / span
    return conf


# -- MBR / local-cost decoding (Flf/LocalCostDecoder.cc) ----------------------

def local_cost_decode(lat: WordLattice, word_penalty: float = 0.0,
                      silence_free: bool = True) -> Tuple[List[int], float]:
    """Minimum-expected-frame-error (min-fWER / local-cost) decoding.

    Risk of an arc = expected frame errors against the frame posterior
    CN:  Σ_{t ∈ span} (1 − p_t(label)) — the frame-error risk builder of
    LocalCostDecoder.cc (ArcSymetricFrameErrorRiskBuilder family); the
    word penalty discourages insertions exactly as the reference's
    paramWordPenalty. Returns (words incl. silence, total risk); DP over
    the lattice DAG picks the risk-minimal path instead of the MAP path.
    """
    post = fwdbwd_posteriors(lat)
    pcn = frame_posterior_cn(lat, post)
    risk: Dict[Arc, float] = {}
    for a in lat.arcs:
        if not np.isfinite(post.get(a, np.inf)):
            risk[a] = float("inf")
            continue
        r = sum(1.0 - pcn[t].get(a.word, 0.0) for t in range(a.start, a.end))
        if not (silence_free and a.word == lat.silence):
            r += word_penalty
        risk[a] = r

    T = lat.num_frames
    best = np.full(T + 1, np.inf)
    best[0] = 0.0
    back: List[Optional[Arc]] = [None] * (T + 1)
    by_end = lat.by_end()
    for t in range(1, T + 1):
        for a in by_end.get(t, []):
            if not np.isfinite(best[a.start]) or not np.isfinite(risk[a]):
                continue
            c = best[a.start] + risk[a]
            if c < best[t]:
                best[t] = c
                back[t] = a
    words: List[int] = []
    t = T
    while t > 0 and back[t] is not None:
        words.append(back[t].word)
        t = back[t].start
    words.reverse()
    return words, float(best[T])


# -- gamma correction (Flf/GammaCorrection.cc) --------------------------------

def gamma_correction_func(x: float, gamma: float, brpt: float = 0.3) -> float:
    """The reference's piecewise-power sharpening
    (GammaCorrection.cc:22-36): identity-anchored at the breakpoint,
    floored at 1e-12, clamped at 1."""
    if x >= 1.0:
        return 1.0
    if x > brpt:
        m = 1.0 - brpt
        y = (1.0 - (1.0 - (x - brpt) / m) ** gamma) * m + brpt
    else:
        y = (x / brpt) ** gamma * brpt
    return max(y, 1e-12)


def gamma_correct_cn(slots: Sequence[CnSlot], gamma: float,
                     normalize: bool = True) -> List[CnSlot]:
    """Gamma-correct CN slot posteriors (CN-gamma-correction node)."""
    if gamma == 1.0:
        return list(slots)
    out = []
    for s in slots:
        probs = {w: gamma_correction_func(p, gamma)
                 for w, p in s.probs.items()}
        if normalize:
            # epsilon mass participates in the re-normalization like any
            # other slot entry (PosteriorCn slots carry it explicitly)
            eps = gamma_correction_func(s.eps_prob(), gamma)
            z = sum(probs.values()) + eps
            probs = {w: p / z for w, p in probs.items()}
        out.append(CnSlot(start=s.start, end=s.end, probs=probs))
    return out


def gamma_correct_fcn(pcn: List[Dict[int, float]], gamma: float,
                      normalize: bool = True) -> List[Dict[int, float]]:
    """Gamma-correct a frame posterior CN (fCN-gamma-correction node)."""
    if gamma == 1.0:
        return pcn
    out = []
    for row in pcn:
        probs = {w: gamma_correction_func(p, gamma) for w, p in row.items()}
        if normalize:
            eps = gamma_correction_func(max(0.0, 1.0 - sum(row.values())),
                                        gamma)
            z = sum(probs.values()) + eps
            probs = {w: p / z for w, p in probs.items()}
        out.append(probs)
    return out


# -- the processor network ----------------------------------------------------

@dataclass
class FlfNode:
    name: str
    type: str
    attrs: Dict[str, str]
    #: outgoing links: (from_port, target_node, to_port)
    links: List[Tuple[int, str, int]] = field(default_factory=list)


def _parse_link(spec: str) -> Tuple[int, str, int]:
    """`[port->]name[:port]` (Network.cc paramLinks)."""
    from_port = 0
    to_port = 0
    if "->" in spec:
        p, spec = spec.split("->", 1)
        from_port = int(p)
    if ":" in spec:
        spec, p = spec.rsplit(":", 1)
        to_port = int(p)
    return from_port, spec, to_port


class FlfNetwork:
    """Config-driven lattice-processor network.

    Blocks (the reference Flf tool's exact layout):

        [network]            initial-nodes = reader
        [network.reader]     type = archive-reader
                             path = /lattices  links = 0->fb:0
        [network.fb]         type = FB-builder  links = best sink

    Per segment, nodes evaluate in topological order; each node type is
    a function (inputs by port, attrs, ctx) → value. ``run(names)``
    drives the batch like the reference's speech-segment/batch nodes.
    """

    def __init__(self, nodes: Dict[str, FlfNode], vocab: Sequence[str],
                 silence: int = 0):
        self.nodes = nodes
        self.vocab = list(vocab)
        self.word_idx = {w: i for i, w in enumerate(self.vocab)}
        self.silence = silence
        self._order = self._topo_order()
        self._archives: Dict[str, LatticeArchive] = {}
        #: evaluator transcript tables, parsed once per file per network
        self._refs_cache: Dict[str, Dict[str, List[int]]] = {}

    @staticmethod
    def parse(cfg: SprintConfig, vocab: Sequence[str], silence: int = 0,
              prefix: str = "network") -> "FlfNetwork":
        # discover nodes + attrs from `[<prefix>.<name>] key = value`;
        # values resolve through cfg.get so $(var) references work like
        # everywhere else in the config system
        attrs_of: Dict[str, Dict[str, str]] = {}
        for sel, _raw in cfg.items():
            if not sel.startswith(prefix + "."):
                continue
            rest = sel[len(prefix) + 1:]
            if "." not in rest:
                continue        # network-level param (initial-nodes, …)
            name, attr = rest.split(".", 1)
            attrs_of.setdefault(name, {})[attr] = cfg.get(sel)
        for n in (cfg.get(f"{prefix}.initial-nodes", "") or "").split():
            attrs_of.setdefault(n, {})
        nodes: Dict[str, FlfNode] = {}
        for n, attrs in sorted(attrs_of.items()):
            links = [_parse_link(s) for s in attrs.pop("links", "").split()]
            nodes[n] = FlfNode(name=n, type=attrs.pop("type", ""),
                               attrs=attrs, links=links)
        for n, node in nodes.items():
            for _fp, tgt, _tp in node.links:
                if tgt not in nodes:
                    raise ValueError(f"flf network: node {n} links to "
                                     f"unknown node {tgt!r}")
        return FlfNetwork(nodes, vocab, silence)

    def _topo_order(self) -> List[str]:
        indeg = {n: 0 for n in self.nodes}
        for node in self.nodes.values():
            for _fp, tgt, _tp in node.links:
                indeg[tgt] += 1
        order, queue = [], sorted(n for n, d in indeg.items() if d == 0)
        while queue:
            n = queue.pop(0)
            order.append(n)
            for _fp, tgt, _tp in self.nodes[n].links:
                indeg[tgt] -= 1
                if indeg[tgt] == 0:
                    queue.append(tgt)
        if len(order) != len(self.nodes):
            raise ValueError("flf network: cycle in node links")
        return order

    def _archive(self, path: str, context: bool = False) -> LatticeArchive:
        key = f"{path}|{context}"
        if key not in self._archives:
            self._archives[key] = LatticeArchive(path, self.vocab,
                                                 context=context)
        return self._archives[key]

    def run_segment(self, seg_id: str, out=sys.stdout) -> Dict[str, object]:
        """Pull one segment through the network; returns every node's
        port-0 output by node name (sinks/writers return None)."""
        values: Dict[Tuple[str, int], object] = {}
        results: Dict[str, object] = {}
        ctx = {"id": seg_id, "net": self, "out": out}
        for n in self._order:
            node = self.nodes[n]
            ins = {p: values.get((n, p)) for p in range(4)
                   if (n, p) in values}
            fn = NODE_TYPES.get(node.type)
            if fn is None:
                raise ValueError(f"flf network: unknown node type "
                                 f"{node.type!r} (node {n})")
            val = fn(ins, node.attrs, ctx)
            results[n] = val
            for fp, tgt, tp in node.links:
                values[(tgt, tp)] = val if fp == 0 else None
        return results

    def run(self, seg_ids: Sequence[str], out=sys.stdout,
            ) -> Dict[str, Dict[str, object]]:
        """Batch driver over segment ids (the reference's batch /
        speech-segment source nodes)."""
        return {sid: self.run_segment(sid, out=out) for sid in seg_ids}


# -- node catalog -------------------------------------------------------------

def _require(ins, port=0):
    v = ins.get(port)
    if v is None:
        raise ValueError("flf node: missing input")
    return v


def _as_lattice(v) -> WordLattice:
    """Unwrap a (lattice, posteriors) pair from FB-builder /
    add-word-confidence: every lattice-consuming node accepts either a
    bare lattice or the annotated pair, so posterior-producing nodes can
    link anywhere (the reference's nodes pass lattices with attached
    score fields the same way)."""
    if isinstance(v, tuple):
        return v[0]
    return v


def n_archive_reader(ins, attrs, ctx):
    net: FlfNetwork = ctx["net"]
    arch = net._archive(attrs["path"],
                        attrs.get("context", "false") == "true")
    return arch.read(ctx["id"], silence=net.silence)


def n_archive_writer(ins, attrs, ctx):
    net: FlfNetwork = ctx["net"]
    net._archive(attrs["path"]).write(ctx["id"], _as_lattice(_require(ins)))
    return None


def n_copy(ins, attrs, ctx):
    return _require(ins)


def n_sink(ins, attrs, ctx):
    return ins.get(0)


def n_info(ins, attrs, ctx):
    lat: WordLattice = _as_lattice(_require(ins))
    print(f"{ctx['id']}\tframes={lat.num_frames}\tarcs={len(lat.arcs)}",
          file=ctx["out"])
    return lat


def n_best(ins, attrs, ctx):
    lat: WordLattice = _as_lattice(_require(ins))
    net: FlfNetwork = ctx["net"]
    words, score = lat.best_path()
    text = " ".join(net.vocab[w] for w in words if w != lat.silence)
    print(f"{ctx['id']}\t{score:.4f}\t{text}", file=ctx["out"])
    return words


def n_dump_n_best(ins, attrs, ctx):
    lat: WordLattice = _as_lattice(_require(ins))
    net: FlfNetwork = ctx["net"]
    n = int(attrs.get("n", "5"))
    rows = lat.n_best(n)
    for rank, (words, score) in enumerate(rows):
        text = " ".join(net.vocab[w] for w in words if w != lat.silence)
        print(f"{ctx['id']}\t{rank}\t{score:.4f}\t{text}", file=ctx["out"])
    return rows


def n_prune_posterior(ins, attrs, ctx):
    lat: WordLattice = _as_lattice(_require(ins))
    return lat.posterior_prune(float(attrs.get("threshold", "5")))


def n_fb_builder(ins, attrs, ctx):
    """FB-builder: annotate the lattice with forward/backward posteriors
    (carried alongside as (lat, posteriors))."""
    lat: WordLattice = _as_lattice(_require(ins))
    return (lat, fwdbwd_posteriors(lat))


def n_add_word_confidence(ins, attrs, ctx):
    v = _require(ins)
    lat, post = v if isinstance(v, tuple) else (v, None)
    return (lat, arc_confidence(lat, post))


def n_local_cost_decoder(ins, attrs, ctx):
    v = _require(ins)
    lat = v[0] if isinstance(v, tuple) else v
    net: FlfNetwork = ctx["net"]
    words, risk = local_cost_decode(
        lat, word_penalty=float(attrs.get("word-penalty", "0")))
    text = " ".join(net.vocab[w] for w in words if w != lat.silence)
    print(f"{ctx['id']}\trisk={risk:.4f}\t{text}", file=ctx["out"])
    return [w for w in words if w != lat.silence]


n_min_fwer_decoder = n_local_cost_decoder     # min-fWER-decoder alias


def n_fcn_builder(ins, attrs, ctx):
    v = _require(ins)
    lat, post = v if isinstance(v, tuple) else (v, None)
    return frame_posterior_cn(lat, post)


def n_cn_builder(ins, attrs, ctx):
    v = _require(ins)
    lat = v[0] if isinstance(v, tuple) else v
    return confusion_network(lat)


def n_pivot_cn_builder(ins, attrs, ctx):
    v = _require(ins)
    lat = v[0] if isinstance(v, tuple) else v
    return pivot_confusion_network(lat)


def n_cn_gamma(ins, attrs, ctx):
    return gamma_correct_cn(_require(ins), float(attrs.get("gamma", "1")),
                            attrs.get("normalize", "true") == "true")


def n_fcn_gamma(ins, attrs, ctx):
    return gamma_correct_fcn(_require(ins), float(attrs.get("gamma", "1")),
                             attrs.get("normalize", "true") == "true")


def n_cn_decoder(ins, attrs, ctx):
    slots = _require(ins)
    net: FlfNetwork = ctx["net"]
    words = cn_decode(slots)
    text = " ".join(net.vocab[w] for w in words if w != net.silence)
    print(f"{ctx['id']}\t{text}", file=ctx["out"])
    return words


def n_mesh(ins, attrs, ctx):
    return mesh_lattice(_as_lattice(_require(ins)))


def n_clean_up(ins, attrs, ctx):
    return trim_lattice(_as_lattice(_require(ins)))


def n_unite(ins, attrs, ctx):
    lats = [_as_lattice(v) for p, v in sorted(ins.items()) if v is not None]
    return union_lattices(lats)


def n_determinize(ins, attrs, ctx):
    return determinize_lattice(_as_lattice(_require(ins)))


def n_minimize(ins, attrs, ctx):
    return minimize_lattice(_as_lattice(_require(ins)))


def n_rescale(ins, attrs, ctx):
    lat: WordLattice = _as_lattice(_require(ins))
    scale = float(attrs.get("scale", "1"))
    arcs = [Arc(start=a.start, end=a.end, word=a.word, score=a.score * scale)
            for a in lat.arcs]
    return WordLattice(arcs=arcs, num_frames=lat.num_frames,
                       silence=lat.silence)


def n_concatenate(ins, attrs, ctx):
    """concatenate-lattices: input 1's lattice appended after input 0's
    in time (Flf/Concatenate.cc)."""
    a: WordLattice = _as_lattice(_require(ins, 0))
    b: WordLattice = _as_lattice(_require(ins, 1))
    off = a.num_frames
    arcs = list(a.arcs) + [Arc(start=x.start + off, end=x.end + off,
                               word=x.word, score=x.score) for x in b.arcs]
    return WordLattice(num_frames=a.num_frames + b.num_frames, arcs=arcs,
                       silence=a.silence)


def n_map_labels(ins, attrs, ctx):
    """map-labels: rewrite word ids via a `from:to from:to ...` map
    (Flf/Map.cc label mapping)."""
    lat: WordLattice = _as_lattice(_require(ins))
    mapping = {}
    for pair in attrs.get("map", "").split():
        f, t = pair.split(":")
        mapping[int(f)] = int(t)
    arcs = [Arc(start=a.start, end=a.end, word=mapping.get(a.word, a.word),
                score=a.score) for a in lat.arcs]
    return WordLattice(num_frames=lat.num_frames, arcs=arcs,
                       silence=lat.silence)


def n_filter(ins, attrs, ctx):
    """filter: drop arcs by score threshold and/or word list
    (Flf/Filter.cc family)."""
    lat: WordLattice = _as_lattice(_require(ins))
    max_score = float(attrs.get("max-score", "inf"))
    drop = {int(w) for w in attrs.get("drop-words", "").split()}
    arcs = [a for a in lat.arcs
            if a.score <= max_score and a.word not in drop]
    return WordLattice(num_frames=lat.num_frames, arcs=arcs,
                       silence=lat.silence)


def n_remove_null_arcs(ins, attrs, ctx):
    """remove-null-arcs: drop zero-duration arcs (Flf/RemoveNullArcs)."""
    lat: WordLattice = _as_lattice(_require(ins))
    arcs = [a for a in lat.arcs if a.end > a.start]
    return WordLattice(num_frames=lat.num_frames, arcs=arcs,
                       silence=lat.silence)


def n_properties(ins, attrs, ctx):
    """properties/info detail: arc/frame/density statistics line."""
    lat: WordLattice = _as_lattice(_require(ins))
    words = {a.word for a in lat.arcs}
    dens = len(lat.arcs) / max(1, lat.num_frames)
    print(f"{ctx['id']}\tframes={lat.num_frames}\tarcs={len(lat.arcs)}\t"
          f"words={len(words)}\tarcs/frame={dens:.2f}", file=ctx["out"])
    return lat


def n_dump_traceback(ins, attrs, ctx):
    """dump-traceback: best path with word boundaries (the reference's
    traceback channel format). One shortest-path DP serves both the
    words and their boundary frames."""
    lat: WordLattice = _as_lattice(_require(ins))
    net: FlfNetwork = ctx["net"]
    by_end = lat.by_end()
    back: Dict[int, Optional[Arc]] = {}
    costs = np.full(lat.num_frames + 1, np.inf)
    costs[0] = 0.0
    for tt in range(1, lat.num_frames + 1):
        for a in by_end.get(tt, []):
            c = costs[a.start] + a.score
            if c < costs[tt]:
                costs[tt] = c
                back[tt] = a
    rows = []
    t = lat.num_frames
    while t > 0 and back.get(t) is not None:
        a = back[t]
        rows.append((a.start, a.end, a.word))
        t = a.start
    for s, e, w in reversed(rows):
        print(f"{ctx['id']}\t{s}\t{e}\t"
              f"{net.vocab[w] if w < len(net.vocab) else w}",
              file=ctx["out"])
    return [w for _s, _e, w in reversed(rows)]


def n_evaluator(ins, attrs, ctx):
    """Edit-distance evaluation against a transcript table file
    (`<name>\\t<words>` rows — the Flf evaluator node against the Bliss
    orth)."""
    from .edit_distance import edit_distance

    hyp = _require(ins)
    if hyp and isinstance(hyp[0], CnSlot):
        hyp = cn_decode(hyp)
    net: FlfNetwork = ctx["net"]
    hyp = [w for w in hyp if w != net.silence]
    # transcript table parsed once per file per NETWORK (ctx is
    # per-segment, so a ctx-level cache would re-read on every segment)
    path = attrs["transcripts"]
    refs = net._refs_cache.get(path)
    if refs is None:
        refs = {}
        with open(path) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) == 2:
                    refs[parts[0]] = [net.word_idx[w]
                                      for w in parts[1].split()
                                      if w in net.word_idx]
        net._refs_cache[path] = refs
    ref = refs.get(ctx["id"], [])
    ed = edit_distance(ref, hyp)
    print(f"{ctx['id']}\terrors={ed.total_count}\tref={len(ref)}",
          file=ctx["out"])
    return (ed.total_count, len(ref))


NODE_TYPES: Dict[str, Callable] = {
    "archive-reader": n_archive_reader,
    "reader": n_archive_reader,
    "archive-writer": n_archive_writer,
    "writer": n_archive_writer,
    "copy": n_copy,
    "cache": n_copy,
    "sink": n_sink,
    "info": n_info,
    "best": n_best,
    "dump-n-best": n_dump_n_best,
    "n-best": n_dump_n_best,
    "prune-posterior": n_prune_posterior,
    "FB-builder": n_fb_builder,
    "add-word-confidence": n_add_word_confidence,
    "local-cost-decoder": n_local_cost_decoder,
    "min-fWER-decoder": n_min_fwer_decoder,
    "fCN-builder": n_fcn_builder,
    "center-frame-CN-builder": n_cn_builder,
    "CN-builder": n_cn_builder,
    "pivot-CN-builder": n_pivot_cn_builder,
    "CN-gamma-correction": n_cn_gamma,
    "fCN-gamma-correction": n_fcn_gamma,
    "CN-decoder": n_cn_decoder,
    "mesh": n_mesh,
    "clean-up": n_clean_up,
    "unite": n_unite,
    "determinize": n_determinize,
    "minimize": n_minimize,
    "rescale": n_rescale,
    "evaluator": n_evaluator,
    "concatenate-lattices": n_concatenate,
    "append": n_concatenate,
    "map-labels": n_map_labels,
    "filter": n_filter,
    "remove-null-arcs": n_remove_null_arcs,
    "properties": n_properties,
    "dump-traceback": n_dump_traceback,
}
