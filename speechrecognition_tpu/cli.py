"""Command-line driver mirroring the reference ``sietill`` binary.

Usage: python -m speechrecognition_tpu.cli <config.json> [action]

Actions (src/sietill/SieTill.cpp:54-243):
  extract-features | train | recognize | train-nn | compute-prior
"""

from __future__ import annotations

import sys

import numpy as np

from .config import Configuration, ParameterBool, ParameterFloat, ParameterInt, ParameterString
from .corpus import Corpus, CorpusDescription
from .features.frontend import (SignalAnalysisConfig, add_deltas,
                                compute_normalization_stats, extract_features)
from .io import (read_audio_file, read_mixture_set, write_feature_file,
                 write_normalization)
from .lexicon import build_sietill_lexicon
from .models.gmm import MixtureModel, VarianceModel
from .tdp import TdpModel


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print("Usage: python -m speechrecognition_tpu.cli <config-file> [action]",
              file=sys.stderr)
        return 1
    # Environment plugins may force their platform over the JAX_PLATFORMS
    # env (e.g. a TPU-tunnel sitecustomize setting jax_platforms="axon,cpu"
    # after import) — re-assert the user's choice so `JAX_PLATFORMS=cpu
    # python -m speechrecognition_tpu.cli ...` really runs on CPU.
    import os
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    config = Configuration(argv[0])
    action = argv[1] if len(argv) >= 2 else ParameterString("action", "")(config)

    feature_path = ParameterString("feature-path", "")(config)
    normalization_path = ParameterString("normalization-path", "")(config)
    max_approx = ParameterBool("max-approx", True)(config)

    lexicon = build_sietill_lexicon()
    description = CorpusDescription.from_config(config, lexicon)
    sig_cfg = SignalAnalysisConfig.from_config(config)

    if action == "extract-features":
        audio_path = ParameterString("audio-path", "")(config)
        audio_format = ParameterString("audio-format", "sph")(config)
        all_rows = []
        for i, seg in enumerate(description.segments):
            print(f"Processing ({i + 1}): {seg.name}", file=sys.stderr)
            audio = read_audio_file(f"{audio_path}{seg.name}.{audio_format}")
            cepstra = extract_features(audio, sig_cfg)
            write_feature_file(f"{feature_path}{seg.name}.mm2", cepstra)
            all_rows.append(add_deltas(cepstra, sig_cfg))
        if normalization_path:
            mean, std = compute_normalization_stats(np.concatenate(all_rows, axis=0))
            write_normalization(normalization_path, mean, std)
        return 0

    if action in ("train", "recognize"):
        pooling = VarianceModel.from_string(ParameterString("pooling", "")(config))
        corpus = Corpus.read(description, feature_path, sig_cfg,
                             normalization_path=normalization_path or None)
        tdp = TdpModel.from_config(config, lexicon.silence_state)

        if action == "train":
            import jax.numpy as jnp
            from .train.em import Trainer, TrainerConfig
            model = MixtureModel(dim=sig_cfg.n_features_total,
                                 num_mixtures=lexicon.num_states,
                                 var_model=pooling, max_approx=max_approx)
            # "f64" reproduces the reference's double-precision accumulation
            # (Mixtures.cpp:590-628) bit-closely; "df32" does the same with
            # two-f32 pairs at f32 device speed (ops/doublefloat.py);
            # "f32" is the plain fast path
            dtype_name = ParameterString("train-dtype", "f32")(config)
            dtype = {"f64": jnp.float64, "df32": "df32"}.get(
                dtype_name, jnp.float32)
            trainer = Trainer(TrainerConfig.from_config(config), lexicon, model,
                              tdp, max_approx=max_approx, dtype=dtype,
                              log=lambda *a: print(*a, file=sys.stderr))
            trainer.train(corpus)
            return 0

        # recognize
        scorer_kind = ParameterString("feature-scorer", "gmm")(config)
        from .search.decoder import Recognizer
        if scorer_kind == "gmm":
            mix_path = ParameterString("load-mixtures-from", "")(config)
            raw = read_mixture_set(mix_path, sig_cfg.n_features_total)
            model = MixtureModel.from_raw(raw, pooling, max_approx=max_approx)
            pack = model.pack()
        elif scorer_kind == "nn":
            from .models.nn import MLP, NNScorer, layer_specs_from_config
            context = ParameterInt("context-frames", 0)(config)
            mlp = MLP(layer_specs_from_config(config),
                      input_dim=sig_cfg.n_features_total * (2 * context + 1))
            params = mlp.load(ParameterString("model-path", "")(config))
            prior = NNScorer.load_prior(
                ParameterString("prior-file", "")(config), lexicon.num_states,
                ParameterFloat("prior-scale", 0.0)(config))
            scorer = NNScorer(mlp, params, prior, context)
            pack = None
        else:
            print(f"unknown feature scorer: {scorer_kind}", file=sys.stderr)
            return 1

        recognizer = Recognizer(config, lexicon, tdp, pack)
        if scorer_kind == "nn":
            recognizer.nn_scorer = scorer  # type: ignore[attr-defined]
        result = recognizer.recognize_corpus(corpus)
        print(f"WER: {result['wer']:.6f}% (S/I/D) "
              f"{result['substitutions']}/{result['insertions']}/{result['deletions']}",
              file=sys.stderr)
        print(f"SER: {result['ser']:.6f}%", file=sys.stderr)
        print(f"Time: {result['time']} seconds", file=sys.stderr)
        print(f"RTF: {result['rtf']}", file=sys.stderr)
        return 0

    if action in ("train-nn", "compute-prior", "plot-activations"):
        from .models.nn import MLP, layer_specs_from_config
        from .train.nn_training import (MiniBatchBuilder, NnTrainer,
                                        compute_prior_from_alignment)
        batch_size = ParameterInt("batch-size", 32)(config)
        corpus = Corpus.read(description, feature_path, sig_cfg,
                             normalization_path=normalization_path or None)
        builder = MiniBatchBuilder.from_config(
            config, corpus, batch_size, lexicon.num_states, lexicon.silence_state)
        if action == "train-nn":
            mlp = MLP(layer_specs_from_config(config), input_dim=builder.feature_size)
            NnTrainer(config, builder, mlp,
                      log=lambda *a: print(*a, file=sys.stderr)).train()
            return 0
        if action == "plot-activations":
            # forward the FIRST (unshuffled) minibatch through the loaded
            # MLP and dump every layer's activations as raw float32 files;
            # optionally t-SNE one layer colored by the target alignment
            # (reference: SieTill.cpp:152-179 + src/activation-plotting/)
            from .tools.tsne import dump_activations, tsne
            mlp = MLP(layer_specs_from_config(config),
                      input_dim=builder.feature_size)
            params = mlp.load(ParameterString("model-path", "")(config))
            acts_dir = ParameterString("activations-path", "activations/")(config)
            feats, targets, mask = builder.build_batch(0, cv=False)
            T, B, F = feats.shape
            valid = (np.arange(T)[:, None] < mask[None, :]).reshape(T * B)
            flat = feats.reshape(T * B, F)[valid]
            labels = targets.reshape(T * B, -1)[valid].argmax(axis=1)
            dump_activations(mlp, params, flat,
                             [s.name for s in mlp.specs], acts_dir)
            np.asarray(labels, np.int32).tofile(acts_dir + "/labels.bin")
            print(f"wrote activations for {flat.shape[0]} frames "
                  f"({len(mlp.specs)} layers) to {acts_dir}", file=sys.stderr)
            tsne_plot = ParameterString("tsne-plot", "")(config)
            if tsne_plot:
                from .tools.tsne import plot_tsne
                layer = ParameterString(
                    "tsne-layer", mlp.specs[0].name)(config)
                max_frames = ParameterInt("tsne-max-frames", 1000)(config)
                import jax.numpy as jnp
                acts = mlp.apply(params, jnp.asarray(flat[:max_frames]))
                Y = tsne(np.asarray(acts[layer], np.float64),
                         perplexity=30.0)
                plot_tsne(Y, labels[:max_frames], tsne_plot)
                print(f"t-SNE of {layer} → {tsne_plot}", file=sys.stderr)
            return 0
        # compute-prior
        prior_file = ParameterString("prior-file", "")(config)
        prior = compute_prior_from_alignment(builder.alignment, lexicon.num_states)
        with open(prior_file, "w") as f:
            f.write(" ".join(str(p) for p in prior) + " ")
        return 0

    if action == "corpus-statistics":
        # Tools/CorpusStatistics parity: segment/frame/word counts
        corpus = Corpus.read(description, feature_path, sig_cfg,
                             normalization_path=normalization_path or None)
        n_words = sum(len(o) for o in corpus.orths)
        hours = corpus.total_audio_seconds / 3600.0
        lens = corpus.lengths
        print(f"segments:       {corpus.num_segments}")
        print(f"frames:         {corpus.total_frames}")
        print(f"audio:          {corpus.total_audio_seconds:.1f} s ({hours:.2f} h)")
        print(f"running words:  {n_words}")
        print(f"frames/segment: min {int(lens.min())} median "
              f"{int(np.median(lens))} max {int(lens.max())}")
        counts = np.bincount(
            np.concatenate([np.asarray(o, dtype=np.int64) for o in corpus.orths])
            if n_words else np.zeros(0, np.int64),
            minlength=lexicon.num_words)
        for w in range(lexicon.num_words):
            print(f"  {lexicon.orth[w]:>10s}: {int(counts[w])}")
        return 0

    print(f"Error: unknown action {action}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
