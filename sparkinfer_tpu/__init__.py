"""SparkInfer-TPU: a TPU-native activation-sparsity LLM inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ganminghao/SparkInfer (a llama.cpp fork with adaptive GPU-CPU hybrid
sparse-FFN inference and online neuron balancing).

Layer map (bottom up), mirroring the reference's layers re-imagined for TPU:

  gguf/       GGUF container + block-quant codecs        (ref: ggml/src/gguf.cpp, ggml-quants.c)
  ops/        Pallas TPU kernels + jnp reference ops     (ref: ggml backends)
  models/     arch registry + per-arch forward builders  (ref: src/llama-arch.*, src/models/*)
  runtime/    KV cache, engine, sampling, batching       (ref: src/llama-context.cpp, llama-kv-cache.cpp)
  sparse/     predictor, DFR stats, neuron tiering       (ref: src/llama-sparkinfer.*, ggml-sparkinfer.hpp)
  parallel/   device mesh + sharding rules               (ref: ggml-backend.cpp scheduler / ggml-rpc)
  tokenizer/  SPM/BPE tokenizers from GGUF vocab         (ref: src/llama-vocab.cpp)
  server/     OpenAI-compatible continuous-batching HTTP (ref: tools/server)
  tools/      cli / bench / perplexity / quantize / convert (ref: tools/*)
"""

__version__ = "0.1.0"
