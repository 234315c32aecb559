"""GLM-ASR-Nano served model.

Processor parity (src/models/glm_asr_nano/processor.rs): audio split into
30 s windows (capped at max_audio_len), each padded to the full window and
mel-extracted; the audio token expands to the summed valid token count;
metadata/default transcription prompt from processor_config.json.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from aha_tpu.core.chat_template import ChatTemplate
from aha_tpu.core.engine import TextEngine
from aha_tpu.core.generate import PrepareData
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.glm_asr_nano import (
    GlmAsrNanoConfig,
    GlmAsrNanoModel,
    audio_token_length,
)
from aha_tpu.models.text_served import (
    TextChatModel,
    load_generation_config,
    load_stop_token_ids,
)
from aha_tpu.params import ChatCompletionParameters, extract_parts
from aha_tpu.registry import ModelEntry
from aha_tpu.utils.device import get_dtype

SAMPLE_RATE = 16000
CHUNK_SECONDS = 30
WINDOW_SAMPLES = SAMPLE_RATE * CHUNK_SECONDS
WINDOW_FRAMES = WINDOW_SAMPLES // 160  # 3000 mel frames per window


class GlmAsrNanoChat(TextChatModel):
    def __init__(self, *args, asr_model: GlmAsrNanoModel = None,
                 processor_cfg: dict | None = None, **kw):
        super().__init__(*args, **kw)
        self.asr_model = asr_model
        self.processor_cfg = processor_cfg or {}
        self.audio_token = self.processor_cfg.get("audio_token",
                                                  "<|pad_audio|>")
        self.max_audio_len = self.processor_cfg.get("max_audio_len", 600)

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "GlmAsrNanoChat":
        from aha_tpu.io.weights import open_weights

        dtype = get_dtype()
        config = GlmAsrNanoConfig.from_file(path)
        model = GlmAsrNanoModel(config, max_rope_len=max_seq_len)
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
        pcfg = {}
        for name in ("processor_config.json", "preprocessor_config.json"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                with open(p) as f:
                    pcfg.update(json.load(f))
        return cls(entry, engine, TokenizerModel.init(path),
                   ChatTemplate.init(path), load_generation_config(path),
                   model_name=os.path.basename(path.rstrip("/")) or entry.name,
                   asr_model=model, processor_cfg=pcfg)

    def get_data(self, mes: ChatCompletionParameters) -> PrepareData:
        from aha_tpu.ops.audio_feats import whisper_log_mel
        from aha_tpu.utils.audio import prepare_audio

        rendered = self.chat_template.apply(
            [m.to_json_dict() for m in mes.messages],
            add_generation_prompt=True)
        sources = []
        for m in mes.messages:
            for p in extract_parts(m.content, "audio_url"):
                sources.append(p.audio_url.url)
        if not sources:
            return PrepareData(input_ids=self.tokenizer.encode(rendered))

        n_mel = self.asr_model.config.audio.num_mel_bins
        windows, token_lens_per_audio = [], []
        max_windows = self.max_audio_len // CHUNK_SECONDS
        for src in sources:
            audio = prepare_audio(src, SAMPLE_RATE)
            n_win = max(1, min((len(audio) + WINDOW_SAMPLES - 1)
                               // WINDOW_SAMPLES, max_windows))
            total_tokens = 0
            for i in range(n_win):
                seg = audio[i * WINDOW_SAMPLES:(i + 1) * WINDOW_SAMPLES]
                frames = max(len(seg) // 160, 8)
                total_tokens += audio_token_length(frames)
                padded = np.zeros(WINDOW_SAMPLES, np.float32)
                padded[:len(seg)] = seg
                windows.append((padded, frames))
            token_lens_per_audio.append(total_tokens)

        mel = whisper_log_mel(
            jnp.asarray(np.stack([w for w, _ in windows])),
            num_mel_bins=n_mel)  # (nw, n_mel, 3000)
        tokens_per_window = mel.shape[2] // 8
        gather = []
        for w, (_, frames) in enumerate(windows):
            gather.extend(range(w * tokens_per_window,
                                w * tokens_per_window
                                + audio_token_length(frames)))
        # expand the audio token per audio
        text = rendered
        for n_tok in token_lens_per_audio:
            text = text.replace(self.audio_token, "<|placeholder|>" * n_tok, 1)
        text = text.replace("<|placeholder|>", self.audio_token)
        input_ids = self.tokenizer.encode(text)

        mm = {"mel": mel.astype(jnp.float32),
              "gather": jnp.asarray(np.asarray(gather, np.int32))}
        return PrepareData(input_ids=input_ids, mm=mm)
