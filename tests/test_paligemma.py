"""PaliGemma on-TPU VLM head (BASELINE.json config 5): conversion +
composed-forward parity against the OFFICIAL HF torch implementation.

Unlike the SAM2/YOLO twins (hand-written torch models fed by an
exporter), transformers ships the reference PaliGemma itself, so the
test drives the REAL production direction: HF state_dict →
convert_hf_state → Flax, then diffs

  - the vision tower (SigLIP patch conv → blocks → post-LN),
  - the composed prefill logits (image substitution, sqrt(hidden)
    scaling, 1-indexed RoPE, bidirectional prefix mask),
  - greedy generation through the static KV cache (decode-step masking
    and position bookkeeping)

against torch outputs at a tiny config. This pins every place a
converted real checkpoint would silently diverge.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from circuitvision_tpu.models.paligemma import (
    PaliGemma,
    convert_hf_state,
    greedy_generate,
    tiny_config,
)
from circuitvision_tpu.models.paligemma.gemma import make_kv_cache

TINY = tiny_config()


def _hf_config():
    from transformers import PaliGemmaConfig

    vc = dict(
        hidden_size=TINY.vision.hidden_size,
        intermediate_size=TINY.vision.intermediate_size,
        num_hidden_layers=TINY.vision.num_hidden_layers,
        num_attention_heads=TINY.vision.num_attention_heads,
        image_size=TINY.vision.image_size,
        patch_size=TINY.vision.patch_size,
        hidden_act="gelu_pytorch_tanh",
        layer_norm_eps=TINY.vision.layer_norm_eps,
        vision_use_head=False,
    )
    tc = dict(
        hidden_size=TINY.text.hidden_size,
        intermediate_size=TINY.text.intermediate_size,
        num_hidden_layers=TINY.text.num_hidden_layers,
        num_attention_heads=TINY.text.num_attention_heads,
        num_key_value_heads=TINY.text.num_key_value_heads,
        head_dim=TINY.text.head_dim,
        vocab_size=TINY.text.vocab_size,
        rms_norm_eps=TINY.text.rms_norm_eps,
        rope_theta=TINY.text.rope_theta,
        hidden_act="gelu_pytorch_tanh",
        attention_bias=False,
    )
    return PaliGemmaConfig(
        vision_config=vc,
        text_config=tc,
        projection_dim=TINY.projection_dim,
        image_token_index=TINY.image_token_id,
        pad_token_id=TINY.pad_token_id,
        bos_token_id=TINY.bos_token_id,
        eos_token_id=TINY.eos_token_id,
    )


@pytest.fixture(scope="module")
def pair():
    from transformers import PaliGemmaForConditionalGeneration

    torch.manual_seed(0)
    hf = PaliGemmaForConditionalGeneration(_hf_config()).eval()
    variables = convert_hf_state(hf.state_dict(), TINY)
    return hf, PaliGemma(TINY), variables


def _inputs(batch=2, n_text=4):
    rng = np.random.default_rng(5)
    n_img = TINY.num_image_tokens
    ids = np.concatenate(
        [
            np.full((batch, n_img), TINY.image_token_id, np.int64),
            np.full((batch, 1), TINY.bos_token_id, np.int64),
            rng.integers(10, 280, (batch, n_text)),
        ],
        axis=1,
    )
    px = rng.standard_normal(
        (batch, TINY.vision.image_size, TINY.vision.image_size, 3)
    ).astype(np.float32)
    return ids, px


class TestVisionTowerParity:
    def test_vision_features_match(self, pair):
        hf, model, variables = pair
        _, px = _inputs()
        t_out = hf.model.vision_tower(
            torch.from_numpy(px.transpose(0, 3, 1, 2))
        ).last_hidden_state
        from circuitvision_tpu.models.paligemma.vision import SiglipVisionTower

        tower = SiglipVisionTower(TINY.vision)
        with jax.default_matmul_precision("highest"):
            j_out = tower.apply(
                {"params": variables["params"]["vision_tower"]}, jnp.asarray(px)
            )
        np.testing.assert_allclose(
            np.asarray(j_out), t_out.detach().numpy(), atol=1e-5, rtol=1e-4
        )


class TestComposedForwardParity:
    def test_prefill_logits_match(self, pair):
        hf, model, variables = pair
        ids, px = _inputs()
        with torch.no_grad():
            t_logits = hf(
                input_ids=torch.from_numpy(ids),
                pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                attention_mask=torch.ones_like(torch.from_numpy(ids)),
            ).logits
        b, s = ids.shape
        k0, v0 = make_kv_cache(TINY.text, b, s)
        with jax.default_matmul_precision("highest"):
            j_logits, _, _ = model.apply(
                variables,
                jnp.asarray(ids, jnp.int32),
                jnp.ones((b, s), jnp.int32),
                k0, v0,
                jnp.asarray(px),
                method=PaliGemma.prefill,
            )
        np.testing.assert_allclose(
            np.asarray(j_logits), t_logits.numpy(), atol=2e-4, rtol=1e-3
        )

    def test_text_only_prefill_matches(self, pair):
        """No image: pure Gemma semantics (embed scaling, RoPE, masks)."""
        hf, model, variables = pair
        rng = np.random.default_rng(9)
        ids = rng.integers(10, 280, (2, 6))
        with torch.no_grad():
            t_logits = hf(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.ones_like(torch.from_numpy(ids)),
            ).logits
        k0, v0 = make_kv_cache(TINY.text, 2, 6)
        with jax.default_matmul_precision("highest"):
            j_logits, _, _ = model.apply(
                variables,
                jnp.asarray(ids, jnp.int32),
                jnp.ones((2, 6), jnp.int32),
                k0, v0, None,
                method=PaliGemma.prefill,
            )
        np.testing.assert_allclose(
            np.asarray(j_logits), t_logits.numpy(), atol=2e-4, rtol=1e-3
        )


class TestGreedyDecodeParity:
    def test_generate_matches_hf(self, pair):
        """The static-cache decode loop (cache update positions, decode
        masks, 1-indexed positions) must reproduce HF's generate()
        token-for-token, including EOS early-stop padding."""
        hf, model, variables = pair
        ids, px = _inputs()
        max_new = 6
        with torch.no_grad():
            gen = hf.generate(
                input_ids=torch.from_numpy(ids),
                pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                attention_mask=torch.ones_like(torch.from_numpy(ids)),
                max_new_tokens=max_new,
                do_sample=False,
            )
        hf_suffix = gen[:, ids.shape[1]:].numpy()
        with jax.default_matmul_precision("highest"):
            res = greedy_generate(
                model, variables,
                jnp.asarray(ids, jnp.int32), jnp.asarray(px),
                jnp.ones((ids.shape[0],), bool), max_new,
            )
        ours = np.asarray(res.tokens)
        # HF right-pads finished rows with pad_token_id, as do we.
        want = np.full_like(ours, TINY.pad_token_id)
        want[:, : hf_suffix.shape[1]] = hf_suffix
        np.testing.assert_array_equal(ours, want)

    def test_decode_step_logits_match_hf_cache_path(self, pair):
        """Logit-level decode parity: teacher-force the SAME token stream
        through HF's incremental KV-cache forward and our decode_step;
        every step's logits must agree. (Note prefill is BIDIRECTIONAL
        over the input by design — prefix-only prefill does not reproduce
        full-prefill prefix logits, so the comparison anchor is HF's own
        cache path, not our prefill.)"""
        hf, model, variables = pair
        ids, px = _inputs(batch=2)
        b, s = ids.shape
        n_steps = 4
        forced = np.array([[30, 40, 50, 60], [35, 45, 55, 65]], np.int64)

        with torch.no_grad():
            out = hf(
                input_ids=torch.from_numpy(ids),
                pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                attention_mask=torch.ones((b, s), dtype=torch.long),
                use_cache=True,
            )
            hf_steps = []
            past = out.past_key_values
            for i in range(n_steps):
                out = hf(
                    input_ids=torch.from_numpy(forced[:, i : i + 1]),
                    attention_mask=torch.ones((b, s + i + 1), dtype=torch.long),
                    past_key_values=past,
                    use_cache=True,
                )
                past = out.past_key_values
                hf_steps.append(out.logits[:, 0].numpy())

        k0, v0 = make_kv_cache(TINY.text, b, s + n_steps)
        mask = jnp.ones((b, s), jnp.int32)
        with jax.default_matmul_precision("highest"):
            _, kc, vc = model.apply(
                variables, jnp.asarray(ids, jnp.int32), mask, k0, v0,
                jnp.asarray(px), method=PaliGemma.prefill,
            )
            for i in range(n_steps):
                step, kc, vc = model.apply(
                    variables, jnp.asarray(forced[:, i], jnp.int32),
                    jnp.int32(s + i), mask, kc, vc,
                    method=PaliGemma.decode_step,
                )
                np.testing.assert_allclose(
                    np.asarray(step), hf_steps[i], atol=2e-4, rtol=1e-3,
                    err_msg=f"decode step {i}",
                )


class TestConverterHostility:
    def test_unconsumed_key_raises(self, pair):
        hf, _, _ = pair
        state = dict(hf.state_dict())
        state["model.language_model.layers.0.mlp.extra.weight"] = torch.zeros(1)
        with pytest.raises(ValueError, match="unconsumed"):
            convert_hf_state(state, TINY)

    def test_missing_key_raises(self, pair):
        hf, _, _ = pair
        state = dict(hf.state_dict())
        state.pop("model.language_model.norm.weight")
        with pytest.raises(KeyError, match="norm.weight"):
            convert_hf_state(state, TINY)

    def test_untied_head_raises(self, pair):
        hf, _, _ = pair
        state = dict(hf.state_dict())
        state["lm_head.weight"] = state["lm_head.weight"] + 1.0
        with pytest.raises(ValueError, match="tied"):
            convert_hf_state(state, TINY)

    def test_old_flat_layout_accepted(self, pair):
        """Pre-4.52 checkpoints use language_model.model.* — same result."""
        hf, _, variables = pair

        def old_name(k: str) -> str:
            k = k.removeprefix("model.")
            if k.startswith("language_model."):
                k = "language_model.model." + k[len("language_model."):]
            if k == "lm_head.weight":
                k = "language_model.lm_head.weight"
            return k

        state = {old_name(k): v for k, v in hf.state_dict().items()}
        v2 = convert_hf_state(state, TINY)
        a = jax.tree_util.tree_leaves(variables)
        b = jax.tree_util.tree_leaves(v2)
        assert all(np.array_equal(x, y) for x, y in zip(a, b))


class TestValueReader:
    """The VLMClient-protocol reader machinery (reader.py): prompt
    layout, batched single-dispatch generation, tokenizer fallback, and
    the parse contract shared with the HTTP clients."""

    def _reader(self, **kw):
        from circuitvision_tpu.models.paligemma.reader import PaliGemmaValueReader

        model = PaliGemma(TINY)
        ids = jnp.full((1, TINY.num_image_tokens + 2), 3, jnp.int32)
        k0, v0 = make_kv_cache(TINY.text, 1, ids.shape[1])
        px = jnp.zeros((1, TINY.vision.image_size, TINY.vision.image_size, 3))
        variables = model.init(
            jax.random.PRNGKey(0), ids, jnp.ones_like(ids), k0, v0, px,
            method=PaliGemma.prefill,
        )
        return PaliGemmaValueReader(
            cfg=TINY, variables=variables, max_new_tokens=6, **kw
        )

    def test_byte_tokenizer_round_trip(self):
        from circuitvision_tpu.models.paligemma.reader import ByteTokenizer

        bt = ByteTokenizer(TINY)
        text = "R1 10kΩ ±5%"
        assert bt.decode(bt.encode(text)) == text
        # special ids never appear in encodings
        specials = {TINY.pad_token_id, TINY.eos_token_id, TINY.bos_token_id,
                    TINY.image_token_id}
        assert not specials & set(bt.encode(text))

    @pytest.mark.slow
    def test_prompt_layout(self):
        r = self._reader()
        ids = r.build_prompt_ids("task")
        n = TINY.num_image_tokens
        assert ids[:n] == [TINY.image_token_id] * n
        assert ids[n] == TINY.bos_token_id
        assert r.decode_fn(ids[n + 1:]) == "task\n"

    def test_generate_batched(self):
        r = self._reader()
        rng = np.random.default_rng(0)
        imgs = [
            rng.integers(0, 255, (40, 52, 3), np.uint8),  # resized path
            rng.integers(
                0, 255,
                (TINY.vision.image_size, TINY.vision.image_size, 3), np.uint8,
            ),
        ]
        texts = r.generate(imgs, "read")
        assert len(texts) == 2 and all(isinstance(t, str) for t in texts)

    def test_get_labels_parses_via_shared_parser(self):
        canned = "[{'id': '1', 'class': 'resistor', 'value': '10k'}]"
        r = self._reader(decode_fn=lambda ids: canned)
        out = r.get_labels(np.zeros((32, 32, 3), np.uint8))
        assert out == [{"id": "1", "class": "resistor", "value": "10k"}]

    def test_get_direction_extracts_answer(self):
        r = self._reader(decode_fn=lambda ids: "the arrow points DOWN (ARROW)")
        assert r.get_direction(
            np.zeros((16, 16, 3), np.uint8), "diode"
        ) == ("DOWN", "ARROW")

    def test_direction_budget_smaller_than_labels(self):
        """Direction calls decode at direction_max_new_tokens, labels at
        max_new_tokens: with random weights (no EOS) the decoded id list
        length IS the budget, so capture it through decode_fn."""
        seen = []

        def capture(ids):
            seen.append(len(list(ids)))
            return "DOWN ARROW"

        r = self._reader(decode_fn=capture, direction_max_new_tokens=3)
        img = np.zeros((16, 16, 3), np.uint8)
        r.get_direction(img, "diode")
        assert seen[-1] <= 3
        r.get_directions_batch([img, img], ["diode", "diode"])
        assert seen[-1] <= 3 and seen[-2] <= 3
        try:
            r.get_labels(img)
        except ValueError:
            pass  # noise text fails the shared parser — budget still ran
        assert seen[-1] > 3  # labels used the full max_new_tokens=6

    def test_get_labels_noise_raises_like_http_clients(self):
        """Random weights → noise → the SAME ValueError contract the
        pipeline's VLM degradation ladder catches (analyzer falls back to
        the valueless netlist)."""
        r = self._reader()
        try:
            out = r.get_labels(np.zeros((32, 32, 3), np.uint8))
        except ValueError:
            return
        assert isinstance(out, list)  # noise accidentally parsed — still a list


class TestPipelineIntegration:
    def test_reader_plugs_into_pipeline_as_vlm_client(self):
        """CircuitAnalyzerTPU accepts the on-device reader as vlm_client:
        the final-netlist stage consumes get_labels output through the
        shared parse/fix path (deterministic via an injected decoder)."""
        from circuitvision_tpu.core.config import DetectorConfig, PipelineConfig
        from circuitvision_tpu.models.paligemma.reader import PaliGemmaValueReader
        from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU
        from tests.test_pipeline import synthetic_circuit

        model = PaliGemma(TINY)
        ids = jnp.full((1, TINY.num_image_tokens + 2), 3, jnp.int32)
        k0, v0 = make_kv_cache(TINY.text, 1, ids.shape[1])
        px = jnp.zeros((1, TINY.vision.image_size, TINY.vision.image_size, 3))
        variables = model.init(
            jax.random.PRNGKey(0), ids, jnp.ones_like(ids), k0, v0, px,
            method=PaliGemma.prefill,
        )
        canned = (
            "[{'id': '1', 'class': 'voltage.dc', 'value': '10'},"
            " {'id': '2', 'class': 'resistor', 'value': '1k'}]"
        )
        reader = PaliGemmaValueReader(
            cfg=TINY, variables=variables, max_new_tokens=4,
            decode_fn=lambda _ids: canned,
        )
        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, num_classes=62),
                use_sam2=False,
            ),
            use_sam2=False,
            vlm_client=reader,
        )
        img, _boxes = synthetic_circuit()
        result = analyzer.analyze(img)
        assert result.netlist_text is not None
        result = analyzer.generate_final_netlist(result)
        if result.enum_image is not None:
            # stage-2 labels flowed through the on-device decode path +
            # the shared parse_vlm_list (direction calls also ran — random
            # weights legitimately yield UNKNOWN there)
            assert result.vlm_stage2_output == [
                {"id": "1", "class": "voltage.dc", "value": "10"},
                {"id": "2", "class": "resistor", "value": "1k"},
            ]


class TestShardedGeneration:
    def test_data_parallel_generate_matches_single_device(self):
        """greedy_generate under a data-sharded batch on the 8-virtual-CPU
        mesh produces the same tokens as the unsharded run (the VLM head's
        multichip serving story: pure DP over the batch, params
        replicated — same scheme as detect/segment in pipeline/batch.py)."""
        import jax

        cpus = jax.devices("cpu")
        if len(cpus) < 8:
            pytest.skip("needs the 8-device CPU mesh (conftest XLA flags)")
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        model = PaliGemma(TINY)
        ids_np, px_np = _inputs(batch=8)
        ids = jnp.asarray(ids_np, jnp.int32)
        px = jnp.asarray(px_np)
        b, s = ids.shape
        k0, v0 = make_kv_cache(TINY.text, 1, s)
        variables = model.init(
            jax.random.PRNGKey(1), ids[:1], jnp.ones((1, s), jnp.int32),
            k0, v0, px[:1], method=PaliGemma.prefill,
        )
        valid = jnp.ones((b,), bool)
        base = greedy_generate(model, variables, ids, px, valid, 5)

        mesh = Mesh(np.array(cpus[:8]), ("data",))
        shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        ids_s = jax.device_put(ids, shard)
        px_s = jax.device_put(px, shard)
        valid_s = jax.device_put(valid, shard)
        vars_s = jax.device_put(variables, repl)
        sharded = greedy_generate(model, vars_s, ids_s, px_s, valid_s, 5)
        np.testing.assert_array_equal(
            np.asarray(base.tokens), np.asarray(sharded.tokens)
        )
        np.testing.assert_array_equal(
            np.asarray(base.lengths), np.asarray(sharded.lengths)
        )


class TestConverterCLI:
    def test_convert_paligemma_checkpoint_roundtrip(self, pair, tmp_path):
        """The checkpoint entry point: torch file AND safetensors-dir
        inputs → orbax checkpoint that restores to the in-memory
        conversion exactly."""
        from safetensors.numpy import save_file

        from circuitvision_tpu.models.checkpoint import (
            convert_paligemma_checkpoint,
            load_variables,
        )

        hf, _, variables = pair

        pt = tmp_path / "model.pt"
        torch.save(hf.state_dict(), pt)
        out1 = tmp_path / "orbax_pt"
        convert_paligemma_checkpoint(str(pt), str(out1), cfg=TINY)

        st_dir = tmp_path / "hf_dir"
        st_dir.mkdir()
        np_state = {k: v.numpy() for k, v in hf.state_dict().items()}
        save_file(np_state, st_dir / "model.safetensors")
        out2 = tmp_path / "orbax_st"
        convert_paligemma_checkpoint(str(st_dir), str(out2), cfg=TINY)

        want = jax.tree_util.tree_leaves(variables)
        for out in (out1, out2):
            got = jax.tree_util.tree_leaves(load_variables(str(out)))
            assert len(got) == len(want)
            assert all(np.array_equal(a, b) for a, b in zip(got, want))


class TestReviewRegressions:
    """Pins for the round-3 self-review fixes."""

    def test_direction_word_boundaries_and_text_order(self):
        from circuitvision_tpu.models.paligemma.reader import PaliGemmaValueReader

        r = TestValueReader()._reader(
            decode_fn=lambda ids: "THE SUPPLY POINTS DOWN (ARROW)"
        )
        assert r.get_direction(np.zeros((8, 8, 3), np.uint8), "diode") == (
            "DOWN", "ARROW",
        )
        r2 = TestValueReader()._reader(decode_fn=lambda ids: "CUPBOARD UPWARD")
        assert r2.get_direction(np.zeros((8, 8, 3), np.uint8), "diode") == (
            "UNKNOWN", "UNKNOWN",
        )

    def test_mid_stream_pad_does_not_truncate_lengths(self, pair):
        """lengths counts emitted steps, not non-pad tokens: force the
        argmax to pad_token_id mid-stream by editing the tied embedding so
        pad has huge logits for exactly one step's hidden state — cheaper:
        just check the invariant on a no-EOS run (count == max_new even if
        pad ids appear in the output)."""
        _, model, variables = pair
        ids, px = _inputs(batch=1)
        res = greedy_generate(
            model, variables, jnp.asarray(ids, jnp.int32), jnp.asarray(px),
            jnp.ones((1,), bool), 5,
        )
        toks = np.asarray(res.tokens)[0]
        n = int(np.asarray(res.lengths)[0])
        if TINY.eos_token_id in toks:
            assert n == list(toks).index(TINY.eos_token_id) + 1
        else:
            assert n == 5  # even if pad_token_id appears mid-stream

    def test_prefill_preserves_non_placeholder_head_tokens(self, pair):
        """masked_scatter semantics: a layout-violating prompt (real token
        inside the image block) keeps its token embedding."""
        _, model, variables = pair
        ids, px = _inputs(batch=1)
        bad = ids.copy()
        bad[0, 1] = 42  # a real token where a placeholder should be
        b, s = bad.shape
        k0, v0 = make_kv_cache(TINY.text, b, s)
        with jax.default_matmul_precision("highest"):
            with_img, _, _ = model.apply(
                variables, jnp.asarray(bad, jnp.int32),
                jnp.ones((b, s), jnp.int32), k0, v0, jnp.asarray(px),
                method=PaliGemma.prefill,
            )
            # zero image: features still substitute at placeholder slots,
            # but position 1 must be driven by token 42's embedding —
            # compare against a reference where position 1 is a DIFFERENT
            # token; logits must differ (i.e. the token is not overwritten)
            bad2 = bad.copy()
            bad2[0, 1] = 43
            k0, v0 = make_kv_cache(TINY.text, b, s)
            with_img2, _, _ = model.apply(
                variables, jnp.asarray(bad2, jnp.int32),
                jnp.ones((b, s), jnp.int32), k0, v0, jnp.asarray(px),
                method=PaliGemma.prefill,
            )
        assert not np.allclose(np.asarray(with_img), np.asarray(with_img2))

    def test_shape_validation_rejects_wrong_cfg(self, pair):
        import dataclasses as dc

        hf, _, _ = pair
        wrong = dc.replace(TINY, text=dc.replace(TINY.text, vocab_size=512))
        with pytest.raises(ValueError, match="declared parameters"):
            convert_hf_state(hf.state_dict(), wrong)


class TestDefaultClientSelection:
    def test_env_selects_on_device_reader(self, pair, tmp_path, monkeypatch):
        """CIRCUITVISION_VLM=paligemma:<ckpt> routes default_client to the
        on-device reader (full checkpoint save → env → factory)."""
        from circuitvision_tpu.enrich.client import default_client
        from circuitvision_tpu.models.checkpoint import save_variables
        from circuitvision_tpu.models.paligemma.reader import PaliGemmaValueReader

        _, _, variables = pair
        ckpt = tmp_path / "pg"
        save_variables(str(ckpt), variables)
        monkeypatch.setenv("CIRCUITVISION_VLM", f"paligemma:{ckpt}")
        # force the full-size config path to use TINY for the test
        import circuitvision_tpu.enrich.client as client_mod
        import circuitvision_tpu.models.paligemma as pg

        monkeypatch.setattr(pg, "PaliGemmaConfig", lambda: TINY)
        got = default_client()
        assert isinstance(got, PaliGemmaValueReader)
        assert got.cfg == TINY

    def test_bad_spec_falls_back_to_none(self, monkeypatch):
        from circuitvision_tpu.enrich.client import default_client

        monkeypatch.setenv("CIRCUITVISION_VLM", "paligemma:/nonexistent")
        monkeypatch.delenv("GEMINI_API_KEY", raising=False)
        monkeypatch.delenv("OPENROUTER_API_KEY", raising=False)
        assert default_client() is None

    def test_int8_suffix_quantizes_at_load(self, pair, tmp_path, monkeypatch):
        """CIRCUITVISION_VLM=paligemma:<ckpt>:int8 loads the float
        checkpoint and serves the quantized decode path."""
        from circuitvision_tpu.enrich.client import default_client
        from circuitvision_tpu.models.checkpoint import save_variables
        from circuitvision_tpu.models.paligemma.reader import PaliGemmaValueReader

        _, _, variables = pair
        ckpt = tmp_path / "pg"
        save_variables(str(ckpt), variables)
        monkeypatch.setenv("CIRCUITVISION_VLM", f"paligemma:{ckpt}:int8")
        import circuitvision_tpu.models.paligemma as pg

        monkeypatch.setattr(pg, "PaliGemmaConfig", lambda: TINY)
        got = default_client()
        assert isinstance(got, PaliGemmaValueReader)
        assert got.cfg.text.quant_int8
        q = got.variables["params"]["decoder"]["layer_0"]["self_attn"]["q_proj"]
        assert set(q) == {"kernel_q", "scale"}
        # and the quantized reader actually generates
        out = got.generate([np.zeros((16, 16, 3), np.uint8)], "task")
        assert len(out) == 1


class TestInt8Quant:
    """Weight-only int8 decode path (quant.quantize_variables +
    QuantDense/QuantEmbed, gemma.py/model.py): the decoder projections
    and the tied embedding store int8 + per-channel scales; scales apply
    AFTER the dot, so a checkpoint whose weights are exactly
    int8 × 2^-k must produce BITWISE-identical logits (power-of-two
    scaling is lossless in floating point) — pinning the plumbing
    independently of quantization rounding."""

    @staticmethod
    def _cfg_q():
        import dataclasses

        return dataclasses.replace(
            TINY, text=dataclasses.replace(TINY.text, quant_int8=True)
        )

    @staticmethod
    def _snap_pow2(variables):
        """Round every quantization-targeted weight to int8 × 2^-5."""

        def walk(tree, path=()):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    if (
                        k in ("q_proj", "k_proj", "v_proj", "o_proj",
                              "gate_proj", "up_proj", "down_proj")
                        and "kernel" in v and "decoder" in path
                    ):
                        w = np.asarray(v["kernel"], np.float32)
                        m = np.abs(w).max(0)
                        q = np.clip(
                            np.rint(np.divide(
                                w * 127, m, out=np.zeros_like(w), where=m > 0
                            )), -127, 127,
                        )
                        out[k] = {"kernel": jnp.asarray(q * 2.0**-5, jnp.float32)}
                    elif k == "embed_tokens" and "embedding" in v:
                        e = np.asarray(v["embedding"], np.float32)
                        m = np.abs(e).max(1, keepdims=True)
                        q = np.clip(
                            np.rint(np.divide(
                                e * 127, m, out=np.zeros_like(e), where=m > 0
                            )), -127, 127,
                        )
                        out[k] = {"embedding": jnp.asarray(q * 2.0**-5, jnp.float32)}
                    else:
                        out[k] = walk(v, path + (k,))
                else:
                    out[k] = v
            return out

        return {"params": walk(variables["params"])}

    def _prefill(self, model, variables, ids, px, extra=4):
        b, s = ids.shape
        k0, v0 = make_kv_cache(model.cfg.text, b, s + extra)
        mask = jnp.ones((b, s), jnp.int32)
        return model.apply(
            variables, jnp.asarray(ids, jnp.int32), mask, k0, v0,
            jnp.asarray(px), method=PaliGemma.prefill,
        )

    def test_pow2_checkpoint_is_bitwise_exact(self, pair):
        from circuitvision_tpu.models.paligemma import quantize_variables

        _, model, variables = pair
        variables = self._snap_pow2(variables)
        vq = quantize_variables(variables)
        model_q = PaliGemma(self._cfg_q())
        ids, px = _inputs()
        lf, _, _ = self._prefill(model, variables, ids, px)
        lq, _, _ = self._prefill(model_q, vq, ids, px)
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(lq))

        gf = greedy_generate(
            model, variables, jnp.asarray(ids, jnp.int32), jnp.asarray(px),
            jnp.ones((ids.shape[0],), bool), 4,
        )
        gq = greedy_generate(
            model_q, vq, jnp.asarray(ids, jnp.int32), jnp.asarray(px),
            jnp.ones((ids.shape[0],), bool), 4,
        )
        np.testing.assert_array_equal(np.asarray(gf.tokens), np.asarray(gq.tokens))

    def test_random_checkpoint_close(self, pair):
        """Arbitrary float weights: per-channel int8 keeps prefill logits
        within a small relative error of the float model."""
        from circuitvision_tpu.models.paligemma import quantize_variables

        _, model, variables = pair
        vq = quantize_variables(variables)
        model_q = PaliGemma(self._cfg_q())
        ids, px = _inputs()
        lf, _, _ = self._prefill(model, variables, ids, px)
        lq, _, _ = self._prefill(model_q, vq, ids, px)
        lf, lq = np.asarray(lf, np.float64), np.asarray(lq, np.float64)
        denom = np.abs(lf).mean()
        assert np.abs(lf - lq).max() / denom < 0.05, (
            np.abs(lf - lq).max(), denom,
        )

    def test_vision_tower_stays_float(self, pair):
        """The vision tower has same-named q/k/v/o modules; they must NOT
        be quantized (prefill runs them once — compute-, not
        bandwidth-bound)."""
        from circuitvision_tpu.models.paligemma import quantize_variables

        _, _, variables = pair
        vq = quantize_variables(variables)
        vt = vq["params"]["vision_tower"]
        leaf_names = set()

        def names(tree):
            for k, v in tree.items():
                if isinstance(v, dict):
                    names(v)
                else:
                    leaf_names.add(k)

        names(vt)
        assert "kernel_q" not in leaf_names
        # and the decoder IS quantized
        dec = vq["params"]["decoder"]["layer_0"]["self_attn"]["q_proj"]
        assert set(dec) == {"kernel_q", "scale"}
        assert np.asarray(dec["kernel_q"]).dtype == np.int8
        assert set(vq["params"]["embed_tokens"]) == {"embedding_q", "scale"}


class TestFinalizeNetlistsBatched:
    """finalize_netlists (pipeline/analyzer.py): the batched stage-2 twin
    of generate_final_netlist — one get_labels_batch dispatch per chunk,
    per-image failure keeps that image's valueless netlist."""

    def _analyzer_and_results(self, reader, n=3):
        import copy

        from circuitvision_tpu.core.config import DetectorConfig, PipelineConfig
        from circuitvision_tpu.eval.synth import make_circuits
        from circuitvision_tpu.pipeline.analyzer import CircuitAnalyzerTPU

        analyzer = CircuitAnalyzerTPU(
            config=PipelineConfig(
                detector=DetectorConfig(scale="n", img_size=64, num_classes=62),
                use_sam2=False,
            ),
            use_sam2=False,
            vlm_client=reader,
        )
        # Oracle detections (same injection as __graft_entry__'s dryrun)
        # so topology produces real nodes and an enumerated image.
        circuit = make_circuits()[0]
        analyzer.bboxes = lambda img: copy.deepcopy(circuit.boxes)
        base = analyzer.analyze(circuit.image)
        assert base.enum_image is not None
        return analyzer, [copy.deepcopy(base) for _ in range(n)]

    def _reader(self, decode_fn):
        from circuitvision_tpu.models.paligemma.reader import PaliGemmaValueReader

        model = PaliGemma(TINY)
        ids = jnp.full((1, TINY.num_image_tokens + 2), 3, jnp.int32)
        k0, v0 = make_kv_cache(TINY.text, 1, ids.shape[1])
        px = jnp.zeros((1, TINY.vision.image_size, TINY.vision.image_size, 3))
        variables = PaliGemma(TINY).init(
            jax.random.PRNGKey(0), ids, jnp.ones_like(ids), k0, v0, px,
            method=PaliGemma.prefill,
        )
        return PaliGemmaValueReader(
            cfg=TINY, variables=variables, max_new_tokens=4, decode_fn=decode_fn,
        )

    def test_batched_equals_per_image(self):
        """Same netlist text from finalize_netlists as from the per-image
        generate_final_netlist loop (deterministic canned decode)."""
        import copy

        canned = "[{'id': '1', 'class': 'voltage.dc', 'value': '10'}]"
        reader = self._reader(lambda _ids: canned)
        analyzer, results = self._analyzer_and_results(reader)
        if results[0].enum_image is None:
            pytest.skip("no enum image on the synthetic circuit")
        per_image = [
            analyzer.generate_final_netlist(copy.deepcopy(r)) for r in results
        ]
        batched = analyzer.finalize_netlists(results, chunk_size=2)
        for a, b in zip(per_image, batched):
            assert a.netlist_text == b.netlist_text
            assert a.vlm_stage2_output == b.vlm_stage2_output

    def test_parse_failure_keeps_valueless(self):
        reader = self._reader(lambda _ids: "not a list at all {{{")
        analyzer, results = self._analyzer_and_results(reader, n=2)
        before = [r.netlist_text for r in results]
        out = analyzer.finalize_netlists(results)
        assert [r.netlist_text for r in out] == before

    def test_malformed_but_parseable_row_keeps_valueless(self):
        """A decode that ast-parses to a list of non-dicts must not
        abort the batch: fix_netlist raising on one image keeps THAT
        image's valueless netlist (reference ladder,
        src/analysis_pipeline.py:368-371)."""
        reader = self._reader(lambda _ids: "['boom', 3]")
        analyzer, results = self._analyzer_and_results(reader, n=2)
        before = [r.netlist_text for r in results]
        out = analyzer.finalize_netlists(results)
        assert [r.netlist_text for r in out] == before

    def test_fallback_without_batch_method(self):
        """A client without get_labels_batch (the HTTP clients) routes
        through the per-image generate_final_netlist path."""

        class MinimalClient:
            def __init__(self):
                self.calls = 0

            def get_labels(self, img):
                self.calls += 1
                return [{"id": "1", "class": "resistor", "value": "5"}]

            def get_direction(self, crop, cls):
                return ("UNKNOWN", "UNKNOWN")

        client = MinimalClient()
        analyzer, results = self._analyzer_and_results(client, n=2)
        out = analyzer.finalize_netlists(results)
        if results[0].enum_image is not None:
            assert client.calls == 2
            assert all(r.netlist_text is not None for r in out)

    def test_fake_client_batch_path_used(self):
        from circuitvision_tpu.enrich.client import FakeVLMClient

        client = FakeVLMClient(
            labels=[{"id": "1", "class": "resistor", "value": "2k"}]
        )
        analyzer, results = self._analyzer_and_results(client, n=3)
        analyzer.finalize_netlists(results, chunk_size=2)
        if results[0].enum_image is not None:
            assert getattr(client, "label_batch_calls", 0) == 2  # ceil(3/2)
            assert client.label_calls == 0


class TestBatchedDirections:
    """get_directions_batch (reader) + the batched branch in
    enrich_directions: all eligible crops of an image in ONE decode
    dispatch, answers parsed per crop."""

    def test_one_dispatch_for_all_components(self):
        from circuitvision_tpu.core.config import EnrichConfig
        from circuitvision_tpu.core.types import BBox
        from circuitvision_tpu.enrich.directions import enrich_directions

        reader = TestFinalizeNetlistsBatched()._reader(
            lambda _ids: "THE PLUS TERMINAL POINTS UP (SIGN)"
        )
        calls = []
        orig = reader.generate

        def counting_generate(images, task, **kw):
            calls.append(len(images))
            return orig(images, task, **kw)

        reader.generate = counting_generate
        img = np.full((64, 64, 3), 255, np.uint8)
        boxes = [
            BBox(class_name="voltage.dc", xmin=5, ymin=5, xmax=20, ymax=25,
                 confidence=0.9, persistent_uid="v1"),
            BBox(class_name="diode", xmin=30, ymin=5, xmax=45, ymax=25,
                 confidence=0.9, persistent_uid="d1"),
            BBox(class_name="resistor", xmin=5, ymin=35, xmax=20, ymax=55,
                 confidence=0.9, persistent_uid="r1"),
        ]
        out = enrich_directions(img, boxes, reader, EnrichConfig())
        assert calls == [2]  # ONE dispatch, both eligible crops
        assert out[0].semantic_direction == "UP"
        assert out[0].semantic_reason == "SIGN"
        assert out[1].semantic_direction == "UP"
        assert out[2].semantic_direction is None  # resistor ineligible

    def test_batch_failure_degrades_to_unknown(self):
        from circuitvision_tpu.core.config import EnrichConfig
        from circuitvision_tpu.core.types import BBox
        from circuitvision_tpu.enrich.directions import enrich_directions

        class Exploding:
            def get_direction(self, crop, cls):
                raise RuntimeError("unused — batch path taken")

            def get_directions_batch(self, crops, classes):
                raise RuntimeError("device fell over")

        img = np.full((64, 64, 3), 255, np.uint8)
        boxes = [BBox(class_name="voltage.dc", xmin=5, ymin=5, xmax=20,
                      ymax=25, confidence=0.9, persistent_uid="v1")]
        out = enrich_directions(img, boxes, Exploding(), EnrichConfig())
        assert out[0].semantic_direction == "UNKNOWN"
        assert out[0].semantic_reason == "UNKNOWN"

    def test_chunk_level_single_dispatch(self):
        """enrich_directions_many: eligible crops of SEVERAL images in one
        dispatch (the chunked pipeline's stage [4])."""
        from circuitvision_tpu.core.config import EnrichConfig
        from circuitvision_tpu.core.types import BBox
        from circuitvision_tpu.enrich.directions import enrich_directions_many

        reader = TestFinalizeNetlistsBatched()._reader(
            lambda _ids: "POINTS LEFT (ARROW)"
        )
        calls = []
        orig = reader.generate
        reader.generate = lambda imgs, task, **kw: (
            calls.append(len(imgs)) or orig(imgs, task, **kw)
        )
        img = np.full((64, 64, 3), 255, np.uint8)

        def box(uid, cls):
            return BBox(class_name=cls, xmin=5, ymin=5, xmax=20, ymax=25,
                        confidence=0.9, persistent_uid=uid)

        outs = enrich_directions_many(
            [img, img, img],
            [[box("a", "voltage.dc")], [box("b", "diode")],
             [box("c", "resistor")]],
            reader, EnrichConfig(),
        )
        assert calls == [2]  # ONE dispatch across all three images
        assert outs[0][0].semantic_direction == "LEFT"
        assert outs[1][0].semantic_reason == "ARROW"
        assert outs[2][0].semantic_direction is None


class TestGenerateBucketing:
    def test_non_power_of_two_batch_pads_and_slices(self):
        """generate pads the batch to a power-of-two bucket (compile-count
        bound for variable direction batches) and slices the pad rows off;
        padded rows must not leak into the output."""
        reader = TestFinalizeNetlistsBatched()._reader(
            lambda ids: f"len{len(list(ids))}"
        )
        seen = []
        orig_gen = greedy_generate

        img = np.full((16, 16, 3), 255, np.uint8)
        import circuitvision_tpu.models.paligemma.reader as reader_mod

        def spy(model, variables, input_ids, pixels, valid, max_new):
            seen.append((int(input_ids.shape[0]), [bool(v) for v in valid]))
            return orig_gen(model, variables, input_ids, pixels, valid, max_new)

        old = reader_mod.greedy_generate
        reader_mod.greedy_generate = spy
        try:
            out = reader.generate([img, img, img], "task")
        finally:
            reader_mod.greedy_generate = old
        assert len(out) == 3
        assert seen == [(4, [True, True, True, False])]
