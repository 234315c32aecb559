"""Qwen3-ASR served model: chat endpoint + /v1/audio/transcriptions.

Behavior parity with src/models/qwen3_asr/{processor,generate}.rs:
- repeated <|audio_start|><|audio_pad|><|audio_end|> runs collapse to one
  (processor.rs:132-143)
- metadata "language" appends "language {Lang}'<asr_text>'" when supported
  (processor.rs:143-151)
- long audio splits into ≤1200 s chunks, each transcribed separately and
  concatenated (generate.rs chunked loop)
- <|audio_pad|> expands to the post-conv token count
  (get_feat_extract_output_lengths)

TPU shape discipline: audio is padded to a frame bucket before the on-device
mel + encoder run inside the prefill jit; mel frames beyond the real length
are zeroed (the reference zero-pads the final window).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from aha_tpu.core.chat_template import ChatTemplate
from aha_tpu.core.engine import TextEngine
from aha_tpu.core.generate import PrepareData
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.qwen3_asr import (
    Qwen3ASRConfig,
    Qwen3ASRModel,
    get_feat_extract_output_lengths,
)
from aha_tpu.models.text_served import (
    TextChatModel,
    load_generation_config,
    load_stop_token_ids,
)
from aha_tpu.params import ChatCompletionParameters, extract_parts
from aha_tpu.registry import ModelEntry
from aha_tpu.utils.device import get_dtype

AUDIO_MARKER = "<|audio_start|><|audio_pad|><|audio_end|>"
AUDIO_PAD = "<|audio_pad|>"
MAX_ASR_SECONDS = 1200.0
SAMPLE_RATE = 16000
FRAME_BUCKETS = (100, 200, 400, 800, 1600, 3200, 6400, 12800, 25600, 51200,
                 102400, 120000)

SUPPORTED_LANGUAGES = {
    "Chinese", "English", "Cantonese", "Arabic", "German", "French",
    "Spanish", "Portuguese", "Indonesian", "Italian", "Korean", "Russian",
    "Thai", "Vietnamese", "Japanese", "Turkish", "Hindi", "Malay", "Dutch",
    "Swedish", "Danish", "Finnish", "Polish", "Czech", "Filipino", "Persian",
    "Greek", "Romanian", "Hungarian", "Macedonian",
}


def _frame_bucket(n: int) -> int:
    for b in FRAME_BUCKETS:
        if n <= b:
            return b
    return FRAME_BUCKETS[-1]


class Qwen3ASRChat(TextChatModel):
    def __init__(self, *args, asr_model: Qwen3ASRModel = None, **kw):
        super().__init__(*args, **kw)
        self.asr_model = asr_model

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "Qwen3ASRChat":
        from aha_tpu.io.weights import open_weights

        dtype = get_dtype()
        config = Qwen3ASRConfig.from_file(path)
        model = Qwen3ASRModel(config, max_rope_len=max_seq_len)
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
        obj = cls(entry, engine, TokenizerModel.init(path),
                  ChatTemplate.init(path), load_generation_config(path),
                  model_name=os.path.basename(path.rstrip("/")) or entry.name,
                  asr_model=model)
        return obj

    # -- preprocessing -------------------------------------------------------

    def _render(self, mes: ChatCompletionParameters) -> str:
        rendered = self.chat_template.apply(
            [m.to_json_dict() for m in mes.messages],
            add_generation_prompt=True)
        count = rendered.count(AUDIO_MARKER)
        if count > 1:
            rendered = rendered.replace(AUDIO_MARKER * count, AUDIO_MARKER)
        lang = mes.metadata_value("language")
        if lang:
            lang = lang[:1].upper() + lang[1:]
            if lang in SUPPORTED_LANGUAGES:
                rendered = f"{rendered}language {lang}'<asr_text>'"
        return rendered

    def _audio_sources(self, mes: ChatCompletionParameters) -> list[str]:
        urls = []
        for m in mes.messages:
            for p in extract_parts(m.content, "audio_url"):
                urls.append(p.audio_url.url)
        return urls

    def _mel_for(self, audio: np.ndarray):
        """audio (T,) → (mel (1, n_mel, F_bucket), n_real_frames, n_out)."""
        from aha_tpu.ops.audio_feats import whisper_log_mel

        n_frames = len(audio) // 160
        bucket = _frame_bucket(max(n_frames, 100))
        padded = np.zeros(bucket * 160, np.float32)
        padded[:len(audio)] = audio
        mel = whisper_log_mel(jnp.asarray(padded)[None],
                              num_mel_bins=self.asr_model.config.audio.num_mel_bins)
        # zero frames beyond the real length (reference zero-pads the last
        # window rather than feeding silence mel)
        valid = jnp.arange(mel.shape[2]) < n_frames
        mel = jnp.where(valid[None, None, :], mel, 0.0)
        n_out = get_feat_extract_output_lengths(n_frames)
        return mel.astype(jnp.float32), n_frames, n_out

    def prepare_chunks(self, mes: ChatCompletionParameters) -> list[PrepareData]:
        from aha_tpu.utils.audio import prepare_audio, split_audio_into_chunks

        rendered = self._render(mes)
        sources = self._audio_sources(mes)
        if not sources:
            # text-only request still works through the thinker
            return [PrepareData(input_ids=self.tokenizer.encode(rendered))]
        chunks: list[np.ndarray] = []
        for src in sources:
            audio = prepare_audio(src, SAMPLE_RATE)
            chunks.extend(split_audio_into_chunks(audio, SAMPLE_RATE,
                                                  MAX_ASR_SECONDS))
        out = []
        for audio in chunks:
            mel, n_frames, n_out = self._mel_for(audio)
            text = rendered.replace(AUDIO_PAD, AUDIO_PAD * n_out, 1)
            out.append(PrepareData(
                input_ids=self.tokenizer.encode(text),
                mm={"mel": mel, "n_out": jnp.int32(n_out)},
            ))
        return out

    def get_data(self, mes: ChatCompletionParameters) -> PrepareData:
        return self.prepare_chunks(mes)[0]

    # -- VAD-fed streaming ASR (generate.rs:89-120) ----------------------------

    DEFAULT_TEMPLATE = ("<|im_start|>system\n<|im_end|>\n<|im_start|>user\n"
                        "<|audio_start|><|audio_pad|><|audio_end|><|im_end|>\n"
                        "<|im_start|>assistant\n")

    def asr_waveform(self, audio: np.ndarray, max_tokens: int = 512) -> str:
        """Transcribe one 16 kHz waveform through the fixed ASR template."""
        from aha_tpu.core.sampling import SamplingConfig

        mel, _, n_out = self._mel_for(np.asarray(audio, np.float32))
        text = self.DEFAULT_TEMPLATE.replace(AUDIO_PAD, AUDIO_PAD * n_out, 1)
        ids = self.engine.generate_tokens(
            self.tokenizer.encode(text), SamplingConfig(), max_tokens,
            mm={"mel": mel, "n_out": jnp.int32(n_out)})
        return self.tokenizer.decode(ids)

    def asr_vad_res(self, vad_res) -> str:
        """Transcribe a FireRedVAD VadFrameResult's flushed speech buffer;
        empty string when the frame carries no speech (generate.rs:89-98)."""
        if not vad_res.is_speech or vad_res.orig_audio is None:
            return ""
        return self.asr_waveform(vad_res.orig_audio)

    # -- generation over chunks ---------------------------------------------

    def generate(self, mes: ChatCompletionParameters):
        chunks = self.prepare_chunks(mes)
        if len(chunks) == 1:
            return super().generate(mes)
        # long audio: transcribe each chunk, concatenate text, sum usage
        from aha_tpu.params import (
            ChatCompletionChoice,
            ChatCompletionResponse,
            ChatMessage,
            Usage,
        )
        from aha_tpu.params.chat import now_created
        import uuid

        cfg = self._sampling_cfg(mes)
        max_tokens = mes.max_tokens or 1024
        texts = []
        pt = ps = ct = cs = 0.0
        for data in chunks:
            ids = self.engine.generate_tokens(data.input_ids, cfg, max_tokens,
                                              mm=data.mm)
            texts.append(self.tokenizer.decode(ids))
            t = self.engine.last_timing
            pt += t.prompt_tokens
            ps += t.prompt_secs
            ct += t.completion_tokens
            cs += t.completion_secs
        return ChatCompletionResponse(
            id=str(uuid.uuid4()),
            choices=[ChatCompletionChoice(
                index=0,
                message=ChatMessage(role="assistant", content="".join(texts)),
                finish_reason="stop")],
            created=now_created(),
            model=self.model_name,
            usage=Usage.from_timing(int(pt), ps, int(ct), cs),
        )
