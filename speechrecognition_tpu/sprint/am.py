"""Acoustic-model assembly: allophones, HMM topology, CART tying, TDPs.

TPU-native counterpart of rwth-asr's ClassicAcousticModel
(Am/ClassicAcousticModel.cc): maps a Bliss lexicon + CART decision tree to

  * per-word HMM automata over *tied* mixture indices (states-per-phone ×
    state-repetitions topology, triphone context within the word,
    ``#`` context across word boundaries when across-word-model = no), and
  * a per-state-type transition model {*, entry-m1, entry-m2, silence} ×
    {loop, forward, skip, exit} (Am/TransitionModel.hh:64-76) read from a
    SprintConfig's ``acoustic-model.tdp`` block.

The output is the same dense table format the SieTill decoders consume
(lexicon.MarkovAutomaton / search.DecoderTables), so the LVCSR lexicon
plugs directly into the batched Viterbi machinery.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..lexicon import Lexicon, MarkovAutomaton
from .bliss import BlissLexicon, Lemma
from .cart import DecisionTree
from .config import SprintConfig


@dataclass(frozen=True)
class StateTypeTdp:
    loop: float = 0.0
    forward: float = 0.0
    skip: float = 0.0
    exit: float = 0.0


@dataclass
class TransitionModel:
    """Per-state-type TDPs (Am/TransitionModel.hh:64-76)."""

    default: StateTypeTdp
    silence: StateTypeTdp
    entry_m1: StateTypeTdp
    entry_m2: StateTypeTdp
    scale: float = 1.0

    @staticmethod
    def from_config(cfg: SprintConfig, prefix: str = "x.acoustic-model.tdp",
                    ) -> "TransitionModel":
        def read(name: str) -> StateTypeTdp:
            base = f"{prefix}.{name}" if name else prefix
            return StateTypeTdp(
                loop=cfg.get_float(f"{base}.loop", 0.0),
                forward=cfg.get_float(f"{base}.forward", 0.0),
                skip=cfg.get_float(f"{base}.skip", 0.0),
                exit=cfg.get_float(f"{base}.exit", 0.0))
        return TransitionModel(
            default=read("anything"),  # resolved via the *.loop wildcards
            silence=read("silence"),
            entry_m1=read("entry-m1"),
            entry_m2=read("entry-m2"),
            scale=cfg.get_float(f"{prefix}.scale", 1.0))


@dataclass
class AllophoneStateModel:
    """Lexicon + CART → tied-state word automata."""

    bliss: BlissLexicon
    tree: DecisionTree
    states_per_phone: int = 3
    state_repetitions: int = 1
    silence_class: Optional[int] = None

    def tied_states_for_pron(self, phonemes: Sequence[str],
                             boundary_lemma: bool = True) -> List[int]:
        """Tied mixture ids for one pronunciation, with within-word triphone
        context and '#' at word boundaries (across-word-model = no)."""
        out: List[int] = []
        n = len(phonemes)
        for i, ph in enumerate(phonemes):
            hist = phonemes[i - 1] if i > 0 else "#"
            fut = phonemes[i + 1] if i < n - 1 else "#"
            if n == 1:
                boundary = "single-phoneme-lemma"
            elif i == 0:
                boundary = "begin-of-lemma"
            elif i == n - 1:
                boundary = "end-of-lemma"
            else:
                boundary = "within-lemma"
            for s in range(self.states_per_phone):
                cls = self.tree.classify({
                    "central": ph, "history[0]": hist, "future[0]": fut,
                    "hmm-state": str(s), "boundary": boundary})
                out.extend([cls] * self.state_repetitions)
        return out

    def build_search_lexicon(self) -> Tuple[Lexicon, List[str], np.ndarray]:
        """Flatten the Bliss lexicon into the dense Lexicon structure used by
        the decoders: one automaton per (lemma, pronunciation), global state
        ids = tied CART classes. Returns (lexicon, orth list, tied-class map
        int32 [num_slots] mapping automaton slots → mixture ids).

        Unlike the SieTill digits (distinct states per word), LVCSR words
        share tied states — the decoder's state_table carries mixture ids
        directly, so the Lexicon here stores tied classes as 'states'.
        """
        lex = Lexicon()
        orths: List[str] = []
        sil = self.bliss.silence_lemma
        # silence first (decoder convention: silence_idx with free entry)
        if sil is not None and sil.pronunciations:
            states = self.tied_states_for_pron(sil.pronunciations[0])
            lex.orth.append(sil.orth[0])
            lex.automata.append(MarkovAutomaton(
                states=np.asarray(states, np.int32)))
            lex.silence = 0
            orths.append(sil.orth[0])
        for lemma in self.bliss.lemmas:
            if lemma.special is not None:
                continue
            for pron in lemma.pronunciations:
                if not pron:
                    continue
                states = self.tied_states_for_pron(pron)
                lex.orth.append(lemma.orth[0])
                lex.automata.append(MarkovAutomaton(
                    states=np.asarray(states, np.int32)))
                orths.append(lemma.orth[0])
        tied = np.concatenate([a.states for a in lex.automata])
        return lex, orths, tied

    @property
    def num_classes(self) -> int:
        return self.tree.max_leaf_id() + 1
