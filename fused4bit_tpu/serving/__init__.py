"""Serving: continuous-batching engine + one-call convenience API."""
from typing import List, Optional, Sequence

from .engine import GenerationRequest, Sampler, ServingEngine
from .speculative import SpeculativeDecoder, speculative_generate

__all__ = [
    "GenerationRequest", "Sampler", "ServingEngine", "generate",
    "SpeculativeDecoder", "speculative_generate",
]


def generate(
    model,
    cfg,
    prompts: Sequence[Sequence[int]],
    *,
    max_new_tokens: int = 32,
    max_seq: int = 512,
    num_slots: Optional[int] = None,
    prefill_bucket: int = 16,
    decode_block: int = 8,
    temperature: float = 0.0,
    seed: int = 0,
    eos_id: Optional[int] = None,
    return_logprobs: bool = False,
) -> List[List[int]]:
    """One-call batch generation: token prompts in, completions out.

    Convenience wrapper over :class:`ServingEngine` (continuous batching,
    chunked prefill, fused multi-step decode) for scripts and tests that
    don't need streaming submission. Returns one token list per prompt, in
    prompt order; with ``return_logprobs`` also one per-token
    log-probability list per prompt (the sampled token's log softmax).
    """
    n = len(prompts)
    if n == 0:
        return ([], []) if return_logprobs else []
    slots = num_slots or min(n, 8)
    from .engine import Sampler

    eng = ServingEngine(
        model, cfg, num_slots=slots, max_seq=max_seq,
        prefill_bucket=prefill_bucket, decode_block=decode_block,
        sampler=Sampler(temperature=temperature), seed=seed,
    )
    for uid, p in enumerate(prompts):
        eng.submit(GenerationRequest(
            uid=uid, prompt=list(p), max_new_tokens=max_new_tokens,
            eos_token=eos_id,
        ))
    out = eng.run()
    toks = [out[uid] for uid in range(n)]
    if return_logprobs:
        return toks, [eng.finished_logprobs[uid] for uid in range(n)]
    return toks
