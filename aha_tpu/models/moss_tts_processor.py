"""Moss-TTS-Nano prompt builder.

Parity with src/models/moss_tts_nano/processor.rs: builds the (S, 1+n_vq)
input-id rows MossTTSModel.generate consumes, for the three modes —

- "tts": plain synthesis (optionally continuing prompt_text+prompt_audio)
- "voice_clone": reference audio rows between the template's Reference
  section and the target text (processor.rs:126-160)

The reference tokenizes with sentencepiece (processor.rs:11); sentencepiece
isn't available here, so the processor takes any `encode(text) -> list[int]`
callable (HF tokenizer, sentencepiece wrapper, test stub).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import numpy as np

from aha_tpu.models.moss_tts import MossTTSConfig
from aha_tpu.utils.text import prepare_tts_text

# template strings (processor.rs:35-57)
_USER_PRE = "<user_inst>\n- Reference(s):\n"
_USER_AFTER = ("\n- Instruction:\nNone\n- Tokens:\nNone\n- Quality:\nNone"
               "\n- Sound Event:\nNone\n- Ambient Sound:\nNone"
               "\n- Language:\nNone\n- Text:\n")
_USER_SUFFIX = "\n</user_inst>"


@dataclasses.dataclass(frozen=True)
class MossPromptIds:
    """Token ids the processor needs beyond the text tokenizer's output."""
    im_start_token_id: int
    im_end_token_id: int
    audio_start_token_id: int
    audio_end_token_id: int
    audio_user_slot_token_id: int
    audio_assistant_slot_token_id: int
    audio_pad_token_id: int


class MossTTSProcessor:
    def __init__(self, cfg: MossTTSConfig, ids: MossPromptIds,
                 encode: Callable[[str], Sequence[int]]):
        self.cfg = cfg
        self.ids = ids
        self.encode = encode
        # precomputed segments (processor.rs:35-58)
        self.prompt_token_ids = ([ids.im_start_token_id]
                                 + list(encode("user\n"))
                                 + list(encode(_USER_PRE)))
        self.user_after_ids = list(encode(_USER_AFTER))
        self.assistant_ids = (list(encode(_USER_SUFFIX))
                              + [ids.im_end_token_id]
                              + list(encode("\n"))
                              + [ids.im_start_token_id]
                              + list(encode("assistant\n")))
        self.none_ids = list(encode("None"))

    # -- mode resolution (processor.rs:73-96) -------------------------------

    @staticmethod
    def resolved_mode(mode: Optional[str], has_prompt_text: bool,
                      has_prompt_audio: bool) -> str:
        mode = mode or "voice_clone"
        if mode == "voice_clone":
            if not has_prompt_audio:
                raise ValueError("voice_clone mode requires prompt audio")
        else:
            if has_prompt_text != has_prompt_audio:
                raise ValueError(
                    "continuation mode accepts either target text only, or "
                    "prompt_text and prompt_audio together.")
        return mode

    # -- row builders (processor.rs:188-212) --------------------------------

    def _text_rows(self, token_ids: Sequence[int]) -> np.ndarray:
        """(len, 1+n_vq): text ids in column 0, audio pad elsewhere."""
        rows = np.full((len(token_ids), 1 + self.cfg.n_vq),
                       self.ids.audio_pad_token_id, np.int32)
        rows[:, 0] = np.asarray(token_ids, np.int32)
        return rows

    def _audio_prefix_rows(self, codes: np.ndarray,
                           slot_token_id: int) -> np.ndarray:
        """(T, 1+n_vq): slot token in column 0, codebook ids after."""
        codes = np.asarray(codes, np.int32)
        rows = np.concatenate(
            [np.full((codes.shape[0], 1), slot_token_id, np.int32), codes],
            axis=1)
        return rows

    # -- entry (processor.rs:98-187) ----------------------------------------

    def build_inference_input_ids(
            self, text: str, prompt_audio_codes: Optional[np.ndarray] = None,
            prompt_text: Optional[str] = None,
            mode: Optional[str] = None) -> np.ndarray:
        """→ (S, 1+n_vq) int32 prompt rows.

        prompt_audio_codes: (T, n_vq) output of
        MossAudioTokenizer.encode (the caller decodes/encodes audio).
        """
        ids = self.ids
        mode = self.resolved_mode(mode, prompt_text is not None,
                                  prompt_audio_codes is not None)
        text = prepare_tts_text(text)
        if prompt_text is not None:
            prompt_text = prepare_tts_text(prompt_text)

        if mode == "voice_clone" and prompt_audio_codes is not None:
            head = self._text_rows(self.prompt_token_ids
                                   + [ids.audio_start_token_id])
            audio_rows = self._audio_prefix_rows(prompt_audio_codes,
                                                 ids.audio_user_slot_token_id)
            suffix = self._text_rows([ids.audio_end_token_id]
                                     + self.user_after_ids
                                     + list(self.encode(text))
                                     + self.assistant_ids
                                     + [ids.audio_start_token_id])
            return np.concatenate([head, audio_rows, suffix], axis=0)

        full_text = (prompt_text + text) if prompt_text is not None else text
        rows = self._text_rows(self.prompt_token_ids + self.none_ids
                               + self.user_after_ids
                               + list(self.encode(full_text))
                               + self.assistant_ids
                               + [ids.audio_start_token_id])
        if prompt_audio_codes is not None:
            rows = np.concatenate(
                [rows, self._audio_prefix_rows(
                    prompt_audio_codes, ids.audio_assistant_slot_token_id)],
                axis=0)
        return rows
