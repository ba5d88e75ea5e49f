"""Flow dataflow networks: XML parsing + execution.

TPU-native counterpart of the reference's Flow engine
(rwth-asr-0.5/src/Flow/: Network.cc, NetworkParser.cc, Node.hh,
Link.hh; filters from Signal/ and Flow/).  The reference pulls typed
packets frame-by-frame through a node graph; here a network is parsed
once into a static DAG and executed as whole-utterance array transforms
(one batched tensor op per node) — the dataflow graph becomes a function
composition, which is what XLA wants to see.

Supported syntax (NetworkParser.cc grammar subset used by the shipped
setups): <network> with <in>/<out>/<param>, <node name filter ...>,
<link from="a[:port]" to="b[:port]"/>, `$(var)` substitution, and
subnetwork filters (filter="lda.flow") resolved relative to the parent
file and inlined with hierarchical names (Flow/NetworkParser's network
expansion).

Node parameters that the reference takes from the configuration tree
(e.g. ``*.lda.file``) are passed via the ``config`` dict keyed by node
path; per-segment runtime parameters (``$(id)``) via ``run(params=...)``.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from .flow_cache import FeatureCache
from .lda import read_matrix_xml

Value = np.ndarray


def _subst(text: str, env: Dict[str, str]) -> str:
    out = text
    for _ in range(8):
        prev = out
        for k, v in env.items():
            out = out.replace(f"$({k})", str(v))
        if out == prev:
            break
    return out


@dataclass
class FlowNode:
    name: str
    filter: str
    attrs: Dict[str, str] = field(default_factory=dict)


@dataclass
class FlowNetwork:
    """Flattened (subnetworks inlined) dataflow DAG."""

    path: str
    nodes: Dict[str, FlowNode]
    links: List[Tuple[str, str, str, str]]   # (from_node, from_port, to, to_port)
    inputs: List[str]
    outputs: List[str]
    params: List[str]

    # -- parsing ---------------------------------------------------------------

    @staticmethod
    def parse(path: str, config: Optional[Dict[str, str]] = None,
              ) -> "FlowNetwork":
        """config: node-path-keyed parameters from the configuration tree
        (e.g. {"lda.file": ".../lda-1.matrix",
               "base-feature-extraction-cache.path": ".../cache"})."""
        config = dict(config or {})
        nodes: Dict[str, FlowNode] = {}
        links: List[Tuple[str, str, str, str]] = []
        ins: List[str] = []
        outs: List[str] = []
        params: List[str] = []
        FlowNetwork._parse_into(path, "", {}, config, nodes, links, ins, outs,
                                params, top=True)
        return FlowNetwork(path=path, nodes=nodes, links=links, inputs=ins,
                           outputs=outs, params=params)

    @staticmethod
    def _parse_into(path: str, prefix: str, outer_env: Dict[str, str],
                    config: Dict[str, str], nodes, links, ins, outs, params,
                    top: bool) -> Tuple[List[str], List[str], str]:
        tree = ET.parse(path)
        root = tree.getroot()
        net_name = root.get("name", "network")
        my_ins = [e.get("name") for e in root.findall("in")]
        my_outs = [e.get("name") for e in root.findall("out")]
        my_params = [e.get("name") for e in root.findall("param")]
        if top:
            ins.extend(my_ins)
            outs.extend(my_outs)
            params.extend(my_params)

        base = os.path.dirname(path)
        sub_io: Dict[str, Tuple[List[str], List[str], str]] = {}
        for e in root.findall("node"):
            raw_name = e.get("name")
            filt = e.get("filter")
            name = prefix + raw_name
            attrs = {k: _subst(v, outer_env)
                     for k, v in e.attrib.items() if k not in ("name", "filter")}
            # configuration-tree parameters for this node path
            for key, val in config.items():
                node_path, _, attr = key.rpartition(".")
                if node_path == name or (not node_path and attr in attrs):
                    if node_path == name:
                        attrs[attr] = str(val)
            if filt.endswith(".flow"):
                # subnetwork params resolve from the node's attributes and
                # the configuration tree scoped to this node path
                env = dict(attrs)
                for key, val in config.items():
                    node_path, _, attr = key.rpartition(".")
                    if node_path == name:
                        env[attr] = str(val)
                sub_path = os.path.join(base, filt)
                s_ins, s_outs, s_name = FlowNetwork._parse_into(
                    sub_path, name + "/", env, config, nodes, links,
                    ins, outs, params, top=False)
                sub_io[raw_name] = (s_ins, s_outs, s_name)
            else:
                nodes[name] = FlowNode(name=name, filter=filt, attrs=attrs)

        def resolve(ref: str, side: str) -> Tuple[str, str]:
            """'node[:port]' within this network → flattened (node, port)."""
            node, _, port = ref.partition(":")
            if node in (net_name, "network"):
                return ("__net__" + prefix, port or ("in" if side == "from"
                                                     else "out"))
            full = prefix + node
            if node in sub_io:
                # link to/from a subnetwork boundary
                return ("__net__" + full + "/", port or
                        ("out" if side == "from" else "in"))
            return (full, port or "")

        for e in root.findall("link"):
            f_node, f_port = resolve(e.get("from"), "from")
            t_node, t_port = resolve(e.get("to"), "to")
            links.append((f_node, f_port, t_node, t_port))
        return my_ins, my_outs, net_name

    # -- execution ---------------------------------------------------------------

    def run(self, registry: Optional[Dict[str, Callable]] = None,
            params: Optional[Dict[str, str]] = None,
            inputs: Optional[Dict[str, Value]] = None,
            context: Optional[dict] = None) -> Dict[str, Value]:
        """Execute the DAG; returns {output_port: value}."""
        registry = {**BUILTIN_FILTERS, **(registry or {})}
        params = dict(params or {})
        context = dict(context or {})
        # value store keyed by (producer node, port)
        values: Dict[Tuple[str, str], Value] = {}
        for port, v in (inputs or {}).items():
            values[("__net__", port)] = v

        # boundary forwarding: a link into __net__<prefix> port p feeds
        # every link out of __net__<prefix> port p
        remaining = list(self.links)
        node_inputs: Dict[str, Dict[str, Tuple[str, str]]] = {}
        fwd: Dict[Tuple[str, str], Tuple[str, str]] = {}
        for f_node, f_port, t_node, t_port in remaining:
            if t_node.startswith("__net__"):
                fwd[(t_node, t_port)] = (f_node, f_port)
            else:
                node_inputs.setdefault(t_node, {})[t_port or "in"] = (
                    f_node, f_port)

        def source_of(ref: Tuple[str, str]) -> Tuple[str, str]:
            seen = set()
            while ref[0].startswith("__net__"):
                if ref in values:
                    return ref
                if ref in seen:
                    raise ValueError(f"flow link cycle at {ref}")
                seen.add(ref)
                key = (ref[0], ref[1])
                if key in fwd:
                    ref = fwd[key]
                elif (ref[0], "") in fwd:
                    ref = fwd[(ref[0], "")]
                else:
                    # top-level input port
                    return ("__net__", ref[1])
            return ref

        def evaluate(node_name: str) -> None:
            if any(k[0] == node_name for k in values):
                return
            node = self.nodes[node_name]
            ins: Dict[str, Value] = {}
            for port, src in node_inputs.get(node_name, {}).items():
                s = source_of(src)
                if s not in values:
                    if s[0].startswith("__net__") or s[0] == "__net__":
                        raise ValueError(
                            f"missing network input for {node_name}:{port}")
                    evaluate(s[0])
                    s2 = (s[0], s[1])
                    if s2 not in values and (s[0], "") in values:
                        s2 = (s[0], "")
                    s = s2
                ins[port] = values[s]
            attrs = {k: _subst(v, params) for k, v in node.attrs.items()}
            if node.filter not in registry:
                raise ValueError(f"unknown flow filter: {node.filter}")
            out = registry[node.filter](ins, attrs, context)
            if isinstance(out, dict):
                for p, v in out.items():
                    values[(node_name, p)] = v
                values[(node_name, "")] = next(iter(out.values()))
            else:
                values[(node_name, "")] = out
                values[(node_name, "out")] = out

        results: Dict[str, Value] = {}
        for out_port in self.outputs:
            src = source_of(("__net__", out_port))
            if src not in values:
                evaluate(src[0])
                if src not in values and (src[0], "") in values:
                    src = (src[0], "")
            results[out_port] = values[src]
        return results


# -- builtin filters (Signal/ + Flow/ node library subset) ---------------------


def _single(ins: Dict[str, Value]) -> Value:
    if "in" in ins:
        return ins["in"]
    return next(iter(ins.values()))


def f_generic_cache(ins, attrs, ctx):
    """Flow/Cache.cc reading side: features for segment $(id)."""
    cache = ctx.get("cache")
    if cache is None:
        cache = FeatureCache(attrs["path"])
        ctx["cache"] = cache
    feats, _t = cache.read_features(attrs["id"])
    return feats


def f_sequence_concatenation(ins, attrs, ctx):
    """signal-vector-f32-sequence-concatenation: sliding window of
    max-size frames with `right` future frames (Signal/ window node)."""
    x = _single(ins)
    max_size = int(attrs.get("max-size", 1))
    right = int(attrs.get("right", 0))
    left = max_size - 1 - right
    T, D = x.shape
    idx = np.clip(np.arange(T)[:, None]
                  + np.arange(-left, right + 1)[None, :], 0, T - 1)
    return x[idx].reshape(T, max_size * D)


def f_matrix_multiplication(ins, attrs, ctx):
    """signal-matrix-multiplication-f32 (Signal/MatrixMultiplication)."""
    x = _single(ins)
    key = ("matrix", attrs["file"])
    if key not in ctx:
        ctx[key] = read_matrix_xml(attrs["file"]).astype(np.float32)
    return x @ ctx[key].T


def f_normalization(ins, attrs, ctx):
    """signal-normalization: per-utterance mean/variance normalization
    (Signal/Normalization.cc, type=mean-and-variance)."""
    x = _single(ins)
    kind = attrs.get("type", "mean-and-variance")
    mean = x.mean(axis=0, keepdims=True)
    if kind == "mean":
        return x - mean
    std = x.std(axis=0, keepdims=True)
    return (x - mean) / np.where(std > 0, std, 1.0)


def f_preemphasis(ins, attrs, ctx):
    """signal-preemphasis (Signal/Preemphasis.cc): x[t] − α·x[t−1]."""
    x = _single(ins).astype(np.float64)
    alpha = float(attrs.get("alpha", 1.0))
    out = x.copy()
    out[1:] -= alpha * x[:-1]
    out[0] *= 1.0 - alpha
    return out


def f_delay(ins, attrs, ctx):
    """generic-delay / identity passthrough."""
    return _single(ins)


BUILTIN_FILTERS: Dict[str, Callable] = {
    "generic-cache": f_generic_cache,
    "signal-vector-f32-sequence-concatenation": f_sequence_concatenation,
    "signal-matrix-multiplication-f32": f_matrix_multiplication,
    "signal-normalization": f_normalization,
    "signal-preemphasis": f_preemphasis,
    "generic-identity": f_delay,
}
