"""sparkinfer-tts — text-to-speech CLI, the TPU-native analogue of the
reference's tools/tts (tts.cpp:1-1093, OuteTTS v0.2/v0.3 + WavTokenizer).

Pipeline:
  1. text -> OuteTTS prompt (numbers spelled out, lowercased, word
     separators; ref process_text tts.cpp:383-419)
  2. OuteTTS language model decodes acoustic-code tokens `<|N|>` (with
     optional guide tokens that re-anchor each word, ref :439-475,886-895)
  3. non-audio tokens stripped, ids rebased to codebook indices (ref
     :1002-1013 — the reference hardcodes the Qwen2.5 id range 151672..
     155772; we derive the base from the vocab's `<|0|>` entry instead)
  4. WavTokenizer-dec vocoder GGUF -> spectrogram -> ISTFT -> WAV
     (models/wavtokenizer.py)

Speaker profiles: OuteTTS speaker JSON (`{"words": [{"word", "duration",
"codes"}]}`) builds the audio_text/audio_data prefix exactly like
audio_text_from_speaker/audio_data_from_speaker (tts.cpp:499-537).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = {2: "twenty", 3: "thirty", 4: "forty", 5: "fifty",
         6: "sixty", 7: "seventy", 8: "eighty", 9: "ninety"}


def _under_thousand(num: int) -> str:
    parts = []
    if num >= 100:
        parts.append(_ONES[num // 100] + " hundred")
        num %= 100
    if num >= 20:
        word = _TENS[num // 10]
        if num % 10:
            word += "-" + _ONES[num % 10]
        parts.append(word)
    elif num > 0:
        parts.append(_ONES[num])
    return " ".join(parts)


def number_to_words(number_str: str) -> str:
    """Spell out an integer/decimal (ref tts.cpp:283-363)."""
    try:
        int_part, _, dec_part = number_str.partition(".")
        n = int(int_part)
    except ValueError:
        return " "
    if n == 0:
        out = "zero"
    else:
        chunks = []
        for scale, name in ((10 ** 9, "billion"), (10 ** 6, "million"),
                            (10 ** 3, "thousand")):
            if n >= scale:
                chunks.append(_under_thousand(n // scale) + " " + name)
                n %= scale
        if n > 0:
            chunks.append(_under_thousand(n))
        out = " ".join(chunks)
    if dec_part:
        out += " point" + "".join(" " + _ONES[int(d)] for d in dec_part
                                  if d.isdigit())
    return out


def replace_numbers_with_words(text: str) -> str:
    return re.sub(r"\d+(\.\d+)?", lambda m: number_to_words(m.group(0)), text)


def process_text(text: str, version: str = "0.2") -> str:
    """OuteTTS text normalisation (ref tts.cpp:383-419)."""
    t = replace_numbers_with_words(text).lower()
    t = re.sub(r"[-_/,\.\\]", " ", t)
    t = re.sub(r"[^a-z\s]", "", t)
    t = re.sub(r"\s+", " ", t).strip()
    sep = "<|space|>" if version == "0.3" else "<|text_sep|>"
    return t.replace(" ", sep)


def speaker_prefix(speaker: dict, version: str = "0.2") -> tuple[str, str]:
    """(audio_text, audio_data) prefix from an OuteTTS speaker profile
    (ref audio_text_from_speaker/audio_data_from_speaker tts.cpp:499-537)."""
    sep = "<|space|>" if version == "0.3" else "<|text_sep|>"
    code_start = "" if version == "0.3" else "<|code_start|>"
    code_end = "<|space|>" if version == "0.3" else "<|code_end|>"
    audio_text = "<|text_start|>"
    audio_data = "<|audio_start|>\n"
    for w in speaker.get("words", []):
        audio_text += str(w["word"]) + sep
        audio_data += "{}<|t_{:.2f}|>{}{}{}\n".format(
            w["word"], float(w["duration"]), code_start,
            "".join(f"<|{int(c)}|>" for c in w["codes"]), code_end)
    return audio_text, audio_data


def detect_version(kv: dict, speaker: dict | None) -> str:
    """OuteTTS version from speaker JSON or chat template (ref
    get_tts_version tts.cpp:477-497)."""
    if speaker and "version" in speaker:
        v = str(speaker["version"])
        return "0.3" if v == "0.3" else "0.2"
    tmpl = kv.get("tokenizer.chat_template", "")
    return "0.3" if tmpl == "outetts-0.3" else "0.2"


def build_parser():
    ap = argparse.ArgumentParser(
        prog="sparkinfer-tts",
        description="OuteTTS text-to-speech (LM + WavTokenizer vocoder)")
    ap.add_argument("-m", "--model", required=True, help="OuteTTS LM GGUF")
    ap.add_argument("-mv", "--model-vocoder", required=True,
                    help="WavTokenizer-dec GGUF")
    ap.add_argument("-p", "--prompt", required=True, help="text to speak")
    ap.add_argument("-o", "--out-file", default="output.wav")
    ap.add_argument("--speaker-file", default=None,
                    help="OuteTTS speaker profile JSON")
    ap.add_argument("--use-guide-tokens", action="store_true",
                    help="force each word's first token (anti-hallucination)")
    ap.add_argument("-n", "--n-predict", type=int, default=4096)
    ap.add_argument("--temp", type=float, default=0.4)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--sample-rate", type=int, default=24000)
    ap.add_argument("-v", "--verbose", action="store_true")
    return ap


def generate_codes(eng, tk, prompt_ids, guide_tokens, n_predict,
                   eos_ids, newline_id):
    """Decode loop with guide-token forcing: after each newline the next
    sampled non-control token is replaced by the next guide token (ref
    tts.cpp:886-895)."""
    cache = eng.new_cache()
    sstate = eng.new_sampler_state()
    tok, cache, sstate, n_past = eng.prefill(prompt_ids, cache, sstate)
    guide = list(guide_tokens)
    control = set(tk.vocab.special_ids()) if guide else set()
    out = []
    next_uses_guide = True
    for _ in range(n_predict):
        if guide and next_uses_guide and tok not in control and tok not in eos_ids:
            tok = guide.pop(0)
        next_uses_guide = tok == newline_id
        out.append(tok)
        if tok in eos_ids:
            break
        tok, cache, sstate = eng.decode_step(tok, n_past, cache, sstate)
        n_past += 1
    return out


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from ..models.loader import load_model
    from ..models.wavtokenizer import (codes_to_audio, load_wavtokenizer,
                                       save_wav16)
    from ..runtime.engine import Engine
    from ..runtime.sampling import SamplerConfig
    from ..tokenizer import build_tokenizer

    speaker = None
    if args.speaker_file:
        speaker = json.loads(open(args.speaker_file).read())

    from ..gguf.reader import GGUFReader

    t0 = time.time()
    model = load_model(args.model)
    tk = build_tokenizer(model.vocab)
    version = detect_version(GGUFReader(args.model).kv, speaker)
    if args.verbose:
        print(f"LM loaded in {time.time()-t0:.1f}s (outetts v{version})",
              file=sys.stderr)

    # --- prompt assembly (ref tts.cpp:640-700) ---
    prompt_clean = process_text(args.prompt, version)
    text = "<|im_start|>\n"
    if speaker:
        audio_text, audio_data = speaker_prefix(speaker, version)
        text += audio_text + prompt_clean + "<|text_end|>\n" + audio_data
    else:
        text += "<|text_start|>" + prompt_clean + "<|text_end|>\n<|audio_start|>\n"
    prompt_ids = tk.encode(text, add_special=False)

    guide_tokens: list[int] = []
    if args.use_guide_tokens:
        sep = "<|space|>" if version == "0.3" else "<|text_sep|>"
        nl = tk.encode("\n", add_special=False)
        guide_tokens = nl[:1]
        for word in prompt_clean.split(sep):
            ids = tk.encode(word, add_special=False)
            if ids:
                guide_tokens.append(ids[0])

    eos_ids = set()
    if model.vocab.eos_id is not None and model.vocab.eos_id >= 0:
        eos_ids.add(model.vocab.eos_id)
    aend = tk.vocab.token_to_id.get("<|audio_end|>")
    if aend is not None:
        eos_ids.add(aend)
    newline_id = tk.encode("\n", add_special=False)
    newline_id = newline_id[0] if newline_id else -1

    eng = Engine(model, max_seq=max(2048, len(prompt_ids) + args.n_predict + 8),
                 sampler=SamplerConfig(temp=args.temp, top_k=args.top_k,
                                       seed=args.seed))
    t_dec = time.time()
    toks = generate_codes(eng, tk, prompt_ids, guide_tokens, args.n_predict,
                          eos_ids, newline_id)
    if args.verbose:
        print(f"decoded {len(toks)} tokens in {time.time()-t_dec:.1f}s",
              file=sys.stderr)

    # --- strip non-audio tokens, rebase to codebook ids ---
    code_base = tk.vocab.token_to_id.get("<|0|>")
    if code_base is None:
        print("vocab has no <|0|> audio-code token", file=sys.stderr)
        return 1
    code_max = code_base
    while f"<|{code_max - code_base + 1}|>" in tk.vocab.token_to_id:
        code_max += 1
    codes = [t - code_base for t in toks if code_base <= t <= code_max]
    if args.verbose:
        print(f"audio codes: {len(codes)}", file=sys.stderr)
    if not codes:
        print("no audio codes generated", file=sys.stderr)
        return 1

    # --- vocoder ---
    t_voc = time.time()
    cfg, params = load_wavtokenizer(args.model_vocoder)
    # spectrogram width is n_fft + 2 (mag ++ phase halves); hop is n_fft/4
    # (ref tts.cpp:206-207 hardcodes 1280/320 for the 1282-wide model)
    n_fft = cfg.n_embd_out - 2
    audio = codes_to_audio(cfg, params, codes, n_fft=n_fft, n_hop=n_fft // 4)
    # zero the first 0.25 s (ref tts.cpp:1075-1079)
    audio = audio.copy()
    audio[: args.sample_rate // 4] = 0.0
    if args.verbose:
        print(f"vocoder+ISTFT in {time.time()-t_voc:.1f}s "
              f"({len(audio)/args.sample_rate:.2f}s audio)", file=sys.stderr)

    save_wav16(args.out_file, audio, args.sample_rate)
    print(f"audio written to '{args.out_file}'", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
