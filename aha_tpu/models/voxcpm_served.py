"""VoxCPM served model: /audio/speech + chat endpoint → base64 WAV.

Behavior parity with src/models/voxcpm/generate.rs:
- metadata knobs: prompt_text, control_instruction, min_len (2),
  max_len (4096), inference_timesteps (10), cfg_value (2.0),
  retry_badcase_ratio_threshold (6.0)  (generate.rs:220-231)
- voice-clone prompt wav via an audio_url content part; a prompt wav
  without prompt_text on a non-VoxCPM2 model errors
  ("reference mode is only supported with VoxCPM2 models", :239-243)
- (control_instruction) prefixes the target text on VoxCPM2 (:245-251)
- response: one assistant message with a single {type: "audio",
  audio_url: {url: "data:audio/wav;base64,..."}} part (response_utils.rs:60)
- streaming unsupported ("{name} model not support stream", :275-294)
- VAE weights load from .pth, model weights from .bin (0.5B) or
  .safetensors (1.5/2) in the same dir (generate.rs:41-107)
"""

from __future__ import annotations

import base64
import glob
import os
import uuid

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.models.audio_vae import AudioVAE
from aha_tpu.models.base import LoadedModel, UnsupportedOperation
from aha_tpu.models.voxcpm import (
    SingleChineseTokenizer,
    VoxCPMConfig,
    VoxCPMModel,
)
from aha_tpu.params import (
    ChatCompletionChoice,
    ChatCompletionParameters,
    ChatCompletionResponse,
    ChatMessage,
    extract_parts,
)
from aha_tpu.params.chat import AudioUrl, ContentPart, now_created
from aha_tpu.registry import ModelEntry


def _extract_user_text(mes: ChatCompletionParameters) -> str:
    texts = []
    for m in mes.messages:
        if m.role == "user":
            texts.append(m.text())
    return "\n".join(t for t in texts if t)


class VoxCPMServed(LoadedModel):
    def __init__(self, entry: ModelEntry, config: VoxCPMConfig,
                 model: VoxCPMModel, params, vae: AudioVAE, vae_params,
                 tokenizer: SingleChineseTokenizer, model_name: str):
        super().__init__(entry)
        self.config = config
        self.model = model
        self.params = params
        self.vae = vae
        self.vae_params = vae_params
        self.tokenizer = tokenizer
        self.model_name = model_name
        self._vae_encode = jax.jit(self.vae.encode)
        self._vae_decode = jax.jit(self.vae.decode)

    @classmethod
    def load(cls, entry: ModelEntry, path: str, **kw) -> "VoxCPMServed":
        from aha_tpu.io.weights import SafetensorsSource, TorchPickleSource

        config = VoxCPMConfig.from_file(path)
        vae = AudioVAE.from_config(config.audio_vae)
        pth = sorted(glob.glob(os.path.join(path, "*.pth")))
        st = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        bins = sorted(glob.glob(os.path.join(path, "*.bin")))
        pth_src = TorchPickleSource(pth) if pth else None
        if bins:
            model_src = TorchPickleSource(bins)
        elif st:
            model_src = SafetensorsSource(st)
        else:
            model_src = pth_src
        vae_src = pth_src or model_src
        model = VoxCPMModel(config, vae.latent_dim)
        # the LM/DiT stack is small and precision-sensitive (CFM); f32
        params = model.load_params(model_src, dtype=jnp.float32)
        vae_params = vae.load_params(vae_src, dtype=jnp.float32)
        name = os.path.basename(path.rstrip("/")) or entry.name
        return cls(entry, config, model, params, vae, vae_params,
                   SingleChineseTokenizer(path), name)

    # -- audio helpers ---------------------------------------------------------

    def _encode_prompt_wav(self, source: str, pad_left: bool) -> np.ndarray:
        """Prompt wav → (T_patches, patch_size, latent) latents
        (model.rs:537-556: pad to a patch multiple, VAE encode, regroup)."""
        from aha_tpu.utils.audio import prepare_audio

        wav = prepare_audio(source, self.vae.sample_rate)
        patch_len = self.config.patch_size * self.vae.chunk_size
        pad = (-len(wav)) % patch_len
        if pad:
            wav = np.concatenate([wav, np.zeros(pad, np.float32)]) \
                if not pad_left else \
                np.concatenate([np.zeros(pad, np.float32), wav])
        mu = self._vae_encode(self.params_vae_arg(), wav[None, None, :])
        mu = np.asarray(mu[0])                      # (latent, T')
        D = self.vae.latent_dim
        P = self.config.patch_size
        return mu.reshape(D, -1, P).transpose(1, 2, 0)  # (T, P, D)

    def params_vae_arg(self):
        return self.vae_params

    def synthesize(self, target_text: str, prompt_text: str | None = None,
                   prompt_wav: str | None = None, min_len: int = 2,
                   max_len: int = 4096, inference_timesteps: int = 10,
                   cfg_value: float = 2.0, ratio_threshold: float = 6.0,
                   seed: int = 0) -> np.ndarray:
        """Full pipeline → waveform (float32, out_sample_rate).
        model.rs:516-707."""
        if prompt_text is not None and prompt_wav is not None:
            text = prompt_text + target_text
            ids = self.tokenizer.encode(text)
            feat = self._encode_prompt_wav(prompt_wav, pad_left=True)
        else:
            ids = self.tokenizer.encode(target_text)
            feat = (self._encode_prompt_wav(prompt_wav, pad_left=False)
                    if prompt_wav else None)
        tt, tm, af, am = self.model.build_context(ids, feat)
        n_target = len(self.tokenizer.encode(target_text))
        max_len = min(max_len, int(n_target * ratio_threshold + 10))
        latents = self.model.inference(self.params, tt, tm, af, am,
                                       min_len, max_len, inference_timesteps,
                                       cfg_value, seed=seed)
        z = jnp.asarray(latents.T)[None]            # (1, latent, T)
        wav = np.asarray(self._vae_decode(self.vae_params, z))[0, 0]
        # trim the causal-conv warmup margin (model.rs:704-705)
        if len(wav) > 1280:
            wav = wav[640:len(wav) - 640]
        return wav.astype(np.float32)

    # -- LoadedModel -------------------------------------------------------------

    def generate(self, mes: ChatCompletionParameters
                 ) -> ChatCompletionResponse:
        from aha_tpu.utils.audio import wav_bytes

        def meta(key, cast, default):
            v = mes.metadata_value(key)
            return cast(v) if v is not None else default

        prompt_text = mes.metadata_value("prompt_text")
        control = mes.metadata_value("control_instruction")
        min_len = meta("min_len", int, 2)
        max_len = meta("max_len", int, 4096)
        steps = meta("inference_timesteps", int, 10)
        cfg_value = meta("cfg_value", float, 2.0)
        ratio = meta("retry_badcase_ratio_threshold", float, 6.0)

        wavs = []
        for m in mes.messages:
            for p in extract_parts(m.content, "audio_url"):
                wavs.append(p.audio_url.url)
        prompt_wav = wavs[0] if wavs else None
        is_v2 = "2" in self.model_name
        if not is_v2 and prompt_wav is not None and prompt_text is None:
            raise UnsupportedOperation(
                "reference mode is only supported with VoxCPM2 models")
        target = _extract_user_text(mes)
        if control and is_v2:
            target = f"({control}){target}"

        wav = self.synthesize(target, prompt_text, prompt_wav, min_len,
                              max_len, steps, cfg_value, ratio,
                              seed=mes.seed or 0)
        b64 = base64.b64encode(
            wav_bytes(wav, self.vae.out_sample_rate)).decode()
        part = ContentPart(type="audio",
                           audio_url=AudioUrl(
                               url=f"data:audio/wav;base64,{b64}"))
        return ChatCompletionResponse(
            id=str(uuid.uuid4()),
            choices=[ChatCompletionChoice(
                index=0,
                message=ChatMessage(role="assistant", content=[part]))],
            created=now_created(), model=self.model_name,
            object="chat.completion")

    def generate_stream(self, mes: ChatCompletionParameters):
        raise UnsupportedOperation(
            f"{self.model_name} model not support stream")
