"""Fun-ASR-Nano served model.

Prompt format is fixed (processor.rs:47-54): qwen-style system/user wrapper
with the audio region as zero token ids marked by fbank_mask.  Frontend:
kaldi fbank (×32768) + LFR 7/6, host-side numpy.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from aha_tpu.core.chat_template import ChatTemplate
from aha_tpu.core.engine import TextEngine, bucket_for
from aha_tpu.core.generate import PrepareData
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.fun_asr_nano import (
    FunAsrNanoConfig,
    FunAsrNanoModel,
    fun_asr_token_length,
)
from aha_tpu.models.text_served import (
    TextChatModel,
    load_generation_config,
    load_stop_token_ids,
)
from aha_tpu.params import ChatCompletionParameters, extract_parts
from aha_tpu.registry import ModelEntry
from aha_tpu.utils.device import get_dtype

PROMPT_PREFIX = ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>"
                 "\n<|im_start|>user\n")
PROMPT_SUFFIX = "<|im_end|>\n<|im_start|>assistant\n"
LFR_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def _lfr_bucket(n: int) -> int:
    for b in LFR_BUCKETS:
        if n <= b:
            return b
    return LFR_BUCKETS[-1]


class FunAsrNanoChat(TextChatModel):
    def __init__(self, *args, asr_model: FunAsrNanoModel = None, **kw):
        super().__init__(*args, **kw)
        self.asr_model = asr_model

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "FunAsrNanoChat":
        from aha_tpu.io.weights import open_weights

        dtype = get_dtype()
        config = FunAsrNanoConfig.from_file(path)
        model = FunAsrNanoModel(config, max_rope_len=max_seq_len)
        params = model.load_params(open_weights(path), dtype=dtype)
        from aha_tpu.parallel.mesh import shard_for_serving

        params, mesh, cache_rules = shard_for_serving(
            model, params, tp=kw.get("tp", 1))
        # ASR transcripts are short and consumed whole (asr.rs endpoint is
        # non-streaming): block decode cuts per-token dispatch overhead to
        # one dispatch per 16 tokens
        engine = TextEngine(model, params,
                            eos_token_ids=load_stop_token_ids(path),
                            cache_dtype=dtype, max_seq_len=max_seq_len,
                            decode_block=16,
                            mesh=mesh, cache_rules=cache_rules)
        return cls(entry, engine, TokenizerModel.init(path),
                   ChatTemplate.str_init("{{ messages }}"),
                   load_generation_config(path),
                   model_name=os.path.basename(path.rstrip("/")) or entry.name,
                   asr_model=model)

    def get_data(self, mes: ChatCompletionParameters) -> PrepareData:
        from aha_tpu.ops.audio_feats import apply_lfr, kaldi_fbank
        from aha_tpu.utils.audio import prepare_audio

        e = self.asr_model.config.encoder
        user_text = ""
        sources = []
        for m in mes.messages:
            if m.role == "user":
                user_text += m.text()
            for p in extract_parts(m.content, "audio_url"):
                sources.append(p.audio_url.url)
        if not sources:
            raise ValueError("FunASRNano need audio input")
        audio = prepare_audio(sources[0], 16000)
        feats = apply_lfr(kaldi_fbank(audio, num_mel_bins=e.n_mels),
                          e.lfr_m, e.lfr_n)
        t_lfr = feats.shape[0]
        n_tok = fun_asr_token_length(t_lfr)

        head = self.tokenizer.encode(PROMPT_PREFIX + user_text)
        tail = self.tokenizer.encode(PROMPT_SUFFIX)
        input_ids = head + [0] * n_tok + tail
        fmask = [0] * len(head) + [1] * n_tok + [0] * len(tail)

        bucket = _lfr_bucket(t_lfr)
        speech = np.zeros((1, bucket, feats.shape[1]), np.float32)
        speech[0, :t_lfr] = feats
        seg = np.full(bucket, -1, np.int32)
        seg[:t_lfr] = 0
        pbucket = bucket_for(len(input_ids))
        fmask_padded = np.zeros(pbucket, bool)
        fmask_padded[:len(fmask)] = fmask
        mm = {
            "speech": jnp.asarray(speech),
            "seg": jnp.asarray(seg),
            "gather": jnp.asarray(np.arange(n_tok, dtype=np.int32)),
            "fbank_mask": jnp.asarray(fmask_padded),
        }
        return PrepareData(input_ids=input_ids, mm=mm)
