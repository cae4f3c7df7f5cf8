"""Multimodal generation pipeline — the analogue of tools/mtmd/mtmd.cpp
(tokenize-with-markers + helper_eval_chunks): text is tokenized around
`<__image__>` markers, each image is encoded by the vision tower and its
patch embeddings are spliced into the embedding sequence, the mixed
sequence prefills the LLM via the inputs_embeds forward, and decode
proceeds token-by-token on the shared KV cache.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import make_forward
from ..runtime.kv_cache import init_cache
from .clip import load_mmproj, make_vision_forward, preprocess_image

MARKER = "<__image__>"  # ref: mtmd.cpp mtmd_default_marker()


class MtmdPipeline:
    def __init__(self, model, mmproj_path: str, max_seq: int = 2048,
                 dtype=jnp.float32):
        self.model = model
        self.cfg = model.config
        self.vcfg, self.vparams = load_mmproj(mmproj_path, dtype)
        self.vision = jax.jit(make_vision_forward(self.vcfg))
        self.embed_fwd = jax.jit(make_forward(self.cfg, inputs_embeds=True))
        self.tok_fwd = jax.jit(make_forward(self.cfg))
        self.max_seq = max_seq
        self.dtype = dtype

    def encode_image(self, img) -> np.ndarray:
        """image -> (n_patches, E_llm) projected embeddings."""
        px = preprocess_image(img, self.vcfg)
        return np.asarray(self.vision(self.vparams, jnp.asarray(px)[None])[0])

    def build_embeds(self, prompt: str, images: list) -> np.ndarray:
        """Tokenize `prompt` around image markers and splice projected
        image embeddings at each marker (ref mtmd_tokenize)."""
        vocab = self.model.vocab
        parts = prompt.split(MARKER)
        assert len(parts) == len(images) + 1, (
            f"prompt has {len(parts) - 1} markers but {len(images)} images")
        tok_embd = np.asarray(self.model.params["tok_embd"], np.float32)
        chunks = []
        for i, part in enumerate(parts):
            if part.strip():
                if vocab is not None:
                    ids = vocab.encode(part)
                else:  # raw space-separated token ids (tools/cli convention)
                    ids = [int(x) for x in part.split()]
                chunks.append(tok_embd[np.asarray(ids, np.int32)])
            if i < len(images):
                chunks.append(self.encode_image(images[i]))
        return np.concatenate(chunks, 0).astype(np.float32)

    def generate(self, prompt: str, images: list, max_new_tokens: int = 64,
                 eos_id: int | None = None) -> list[int]:
        """Greedy multimodal generation."""
        embeds = self.build_embeds(prompt, images)
        T = embeds.shape[0]
        assert T < self.max_seq, "prompt+images exceed max_seq"
        cache = init_cache(self.cfg, 1, self.max_seq, self.dtype)
        pos = jnp.arange(T, dtype=jnp.int32)[None]
        logits, cache = self.embed_fwd(
            self.model.params, jnp.asarray(embeds)[None], pos, cache)
        tok = int(jnp.argmax(logits[0, -1]))
        out = [tok]
        for t in range(T, T + max_new_tokens - 1):
            if eos_id is not None and tok == eos_id:
                break
            logits, cache = self.tok_fwd(
                self.model.params, jnp.asarray([[tok]], jnp.int32),
                jnp.full((1, 1), t, jnp.int32), cache)
            tok = int(jnp.argmax(logits[0, -1]))
            out.append(tok)
        return out
