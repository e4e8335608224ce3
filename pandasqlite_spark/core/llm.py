"""LLM callback protocol, sanity check, and a deterministic fake for tests.

The reference's only extension point is ``llm_callback: str -> str``
(reference ``pandasqlite/pandasqlite.py:57, 183``; ``README.md:57-68``),
defaulting to a watsonx.ai llama-3-405b backend
(``pandasqlite.py:24-54``).  We keep the same plain-function protocol —
LLM calls are **driver-side**, a handful per ingest, never a Spark UDF.

Fixes over the reference, noted in SURVEY.md §2.A:

- ``sanity_check`` honors the passed callback (the reference calls its
  default backend directly at ``pandasqlite.py:261``, so custom models
  could never pass without watsonx credentials).
- failure raises instead of ``exit(0)`` (``pandasqlite.py:279``).

No network backend is bundled: this container is offline, and the
engine is backend-agnostic by design.  Wire any ``str -> str`` model
function in; :class:`FakeLLM` covers tests (SURVEY.md §5-1).
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable

LLMCallback = Callable[[str], str]

_sanity_memo: dict[int, bool] = {}


class LLMNotSane(RuntimeError):
    pass


class ReplayLLM:
    """Replays a RECORDED transcript of completions, in order — the
    offline stand-in for a real model that, unlike :class:`FakeLLM`'s
    scripted question→answer table, reproduces the *shape* of real
    completions (chatty preambles, unfenced SQL, wrong identifiers,
    SQLite-isms) so the extract → dialect-rewrite → repair loop is
    exercised on realistic input, not on answers crafted to parse.

    The sanity-check probe is answered inline (it is not part of the
    recorded turn sequence); every other call consumes the next
    transcript entry.  Prompts are recorded in ``self.prompts`` so
    tests can assert what the repair loop actually sent (e.g. that the
    second prompt carries the analyzer's error text).  Running past the
    end of the transcript raises — a repair loop that needs more turns
    than the recording has is a behavior change worth failing on.
    """

    def __init__(self, transcript: list[str]):
        self.transcript = list(transcript)
        self.prompts: list[str] = []
        self._i = 0

    def __call__(self, prompt: str) -> str:
        if "sanity check" in prompt.lower():
            return "YES"
        self.prompts.append(prompt)
        if self._i >= len(self.transcript):
            raise AssertionError(
                f"transcript exhausted after {len(self.transcript)} turns"
            )
        out = self.transcript[self._i]
        self._i += 1
        return out


def sanity_check(llm_callback: LLMCallback) -> None:
    """One-shot "reply YES" probe, memoized per callback (semantics of
    reference ``pandasqlite/pandasqlite.py:253-280``, with the callback
    and exit() bugs fixed)."""
    key = id(llm_callback)
    if _sanity_memo.get(key):
        return
    reply = llm_callback(
        "This is a sanity check. Reply with the single word YES and nothing else."
    )
    if reply.strip().strip("'\"").upper() != "YES":
        raise LLMNotSane(f"LLM sanity check failed; got: {reply!r}")
    _sanity_memo[key] = True


class FakeLLM:
    """Deterministic, offline stand-in for the LLM callback.

    Understands the engine's enrichment prompts well enough to produce
    schema-plausible JSON, and answers text2sql prompts from a
    ``question -> sql`` table supplied by the test.  This is the
    test-strategy cornerstone the reference never had (SURVEY.md §5-1).
    """

    def __init__(self, text2sql_answers: dict[str, str] | None = None):
        self.answers = text2sql_answers or {}
        self.calls: list[str] = []

    def __call__(self, prompt: str) -> str:
        self.calls.append(prompt)
        if "sanity check" in prompt.lower():
            return "YES"
        if "[QUESTION]" in prompt or "```sql" in prompt:
            for q, sql in self.answers.items():
                if q in prompt:
                    return f"```sql\n{sql}\n```"
            return "```sql\nSELECT 1 AS one\n```"
        if "TEXT, NUMBER, ENUM" in prompt or "TEXT, NUMBER or ENUM" in prompt:
            cols = self._columns_from_prompt(prompt)
            return json.dumps({c: "TEXT" for c in cols})
        if "description of each column" in prompt:
            cols = self._columns_from_prompt(prompt)
            return json.dumps({c: f"column {c}" for c in cols})
        if "description of each value" in prompt:
            vals = self._values_from_prompt(prompt)
            return json.dumps({v: f"value {v}" for v in vals})
        if "curriculum" in prompt:
            return json.dumps(
                [
                    {
                        "question": "How many rows are there?",
                        "sql": "SELECT COUNT(*) AS n FROM table",
                        "difficulty": 1,
                    }
                ]
            )
        return "YES"

    @staticmethod
    def _columns_from_prompt(prompt: str) -> list[str]:
        m = re.findall(r'"([^"]+)":', prompt)
        return list(dict.fromkeys(m)) or ["col"]

    @staticmethod
    def _values_from_prompt(prompt: str) -> list[str]:
        m = re.findall(r"- ([^\n]+)", prompt)
        return list(dict.fromkeys(v.strip() for v in m)) or ["value"]


def watsonx_http_backend(
    base_url: str,
    *,
    model_id: str = "meta-llama/llama-3-405b-instruct",
    max_new_tokens: int = 4096,
    api_key: str | None = None,
    iam_url: str | None = None,
    project_id: str | None = None,
    api_version: str = "2023-05-29",
    max_retries: int = 3,
    retry_base_s: float = 1.0,
) -> LLMCallback:
    """The watsonx text-generation REST path on the standard library
    alone — the executable twin of :func:`watsonx_backend` for
    environments without the SDK, and the seam a test can point at an
    in-process HTTP stub (round-5 verdict #4).  Same generation
    contract as the reference backend (``pandasqlite.py:24-54``):
    ``input:`` prompt prefix, greedy decoding, ``max_new_tokens``,
    ``"\\n\\n"`` stop sequence, completion truncated at the first
    ``"\\n\\n"``.

    Auth: with ``iam_url`` set, ``api_key`` is exchanged for a bearer
    token via the IAM apikey grant (cached; re-exchanged once on 401 —
    token expiry); otherwise ``api_key`` itself is sent as the bearer.
    Transport: POST ``{base_url}/ml/v1/text/generation?version=...``;
    429/5xx and socket errors retry with exponential backoff
    (``retry_base_s * 2^attempt``, ``max_retries`` attempts); 4xx
    raises immediately with the response body.  Driver-side only, a
    handful of calls per ingest — never a Spark UDF.
    """
    import time
    import urllib.error
    import urllib.parse
    import urllib.request

    gen_url = base_url.rstrip("/") + "/ml/v1/text/generation?version=" + api_version
    token_cache: dict[str, str] = {}

    def _bearer(force: bool = False) -> str:
        if iam_url is None:
            return api_key or ""
        if force or "tok" not in token_cache:
            body = urllib.parse.urlencode(
                {
                    "grant_type": "urn:ibm:params:oauth:grant-type:apikey",
                    "apikey": api_key or "",
                }
            ).encode()
            req = urllib.request.Request(
                iam_url,
                data=body,
                headers={"Content-Type": "application/x-www-form-urlencoded"},
            )
            with urllib.request.urlopen(req) as resp:
                token_cache["tok"] = json.loads(resp.read())["access_token"]
        return token_cache["tok"]

    def callback(prompt: str) -> str:
        payload = json.dumps(
            {
                "model_id": model_id,
                "input": "input:" + prompt,
                "parameters": {
                    "decoding_method": "greedy",
                    "max_new_tokens": max_new_tokens,
                    "stop_sequences": ["\n\n"],
                },
                **({"project_id": project_id} if project_id else {}),
            }
        ).encode()
        refreshed = False
        for attempt in range(max_retries + 1):
            req = urllib.request.Request(
                gen_url,
                data=payload,
                headers={
                    "Content-Type": "application/json",
                    "Accept": "application/json",
                    "Authorization": "Bearer " + _bearer(),
                },
            )
            try:
                with urllib.request.urlopen(req) as resp:
                    out = json.loads(resp.read())
                text = out["results"][0]["generated_text"]
                return text.split("\n\n")[0]
            except urllib.error.HTTPError as exc:
                if exc.code == 401 and iam_url is not None and not refreshed:
                    _bearer(force=True)  # expired token: one re-exchange
                    refreshed = True
                    continue
                if exc.code not in (429,) and exc.code < 500:
                    raise RuntimeError(
                        f"watsonx HTTP {exc.code}: {exc.read().decode(errors='replace')}"
                    ) from exc
                if attempt == max_retries:
                    raise
            except urllib.error.URLError:
                if attempt == max_retries:
                    raise
            time.sleep(retry_base_s * (2**attempt))
        raise AssertionError("unreachable")  # pragma: no cover

    return callback


def watsonx_backend(
    model_id: str = "meta-llama/llama-3-405b-instruct",
    *,
    max_new_tokens: int = 4096,
    credentials: dict | None = None,
    project_id: str | None = None,
    base_url: str | None = None,
    api_key: str | None = None,
    iam_url: str | None = None,
) -> LLMCallback:
    """The reference's default backend, rebuilt as an optional factory
    (reference ``pandasqlite/pandasqlite.py:24-54``): greedy decoding,
    ``max_new_tokens=4096``, stop sequence ``"\\n\\n"``, prompt prefixed
    with ``"input:"``, completion truncated at the first ``"\\n\\n"``.

    With ``base_url`` set, delegates to :func:`watsonx_http_backend`
    (stdlib HTTP, no SDK needed) — the override a test or an
    SDK-less deployment points at any watsonx-shaped endpoint.
    Otherwise requires ``ibm_watsonx_ai`` (not bundled — this engine is
    backend-agnostic and offline-testable); raises ImportError with a
    clear message if absent.  Returned callable is a plain ``str ->
    str`` driver-side function like every other backend.
    """
    if base_url is not None:
        return watsonx_http_backend(
            base_url,
            model_id=model_id,
            max_new_tokens=max_new_tokens,
            api_key=api_key,
            iam_url=iam_url,
            project_id=project_id,
        )
    try:
        from ibm_watsonx_ai import Credentials  # type: ignore
        from ibm_watsonx_ai.foundation_models import ModelInference  # type: ignore
    except ImportError as exc:  # pragma: no cover - lib absent in CI
        raise ImportError(
            "watsonx_backend requires the optional dependency "
            "'ibm_watsonx_ai'; install it or pass your own llm_callback "
            "(any str -> str function)."
        ) from exc

    model = ModelInference(  # pragma: no cover - network backend
        model_id=model_id,
        credentials=Credentials(**credentials) if credentials else None,
        project_id=project_id,
        params={
            "decoding_method": "greedy",
            "max_new_tokens": max_new_tokens,
            "stop_sequences": ["\n\n"],
        },
    )

    def callback(prompt: str) -> str:  # pragma: no cover - network backend
        out = model.generate_text(prompt="input:" + prompt)
        return out.split("\n\n")[0]

    return callback
