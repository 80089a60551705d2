"""Real HTTP client for the LLM extraction path (Ollama wire protocol).

The batched-async extraction stage (:mod:`~graphrag_rs_spark.operators.
llm_extraction`) takes any object with ``acomplete(prompt) -> str``; this
module supplies the production implementation of that protocol speaking
the Ollama ``/api/generate`` API the reference talks to
(graphrag-core/src/ollama/mod.rs:72-135: POST ``{model, prompt,
stream:false, options:{num_predict, temperature}}``, answer text in the
JSON ``response`` field, per-call retry with 100·attempt ms backoff).

Pure stdlib: ``urllib`` driven through ``asyncio.to_thread`` so the
extraction stage's semaphore-bounded task pool stays fully async without
external HTTP dependencies on executors. No live endpoint exists in this
sandbox — the tests run the client against an in-process ``http.server``
double, which exercises the REAL wire path (socket, JSON envelope, error
mapping, retry) end-to-end through the Spark stage.

Usage on a real cluster::

    from graphrag_rs_spark.operators.llm_client import OllamaHttpClient
    from graphrag_rs_spark.operators.llm_extraction import extract_chunks_llm

    extraction = extract_chunks_llm(
        chunks,
        client_factory=lambda: OllamaHttpClient(
            base_url="http://ollama-gateway:11434", model="llama3.2:3b",
        ),
    )

``client_factory`` runs once per Python worker (executor-side), so each
worker holds one client; cluster-wide in-flight requests stay bounded by
executors × ``extract_chunks_llm(concurrency=…)``.
"""

from __future__ import annotations

import asyncio
import json
import time
import urllib.error
import urllib.request
from dataclasses import dataclass


@dataclass
class OllamaHttpClient:
    """``acomplete`` protocol impl over Ollama's generate API.

    Defaults mirror the reference's ``OllamaConfig`` (ollama/mod.rs:32-46:
    localhost:11434, 30 s timeout, 3 attempts, temperature 0.7, 2000
    max tokens). The extraction stage's own :class:`LLMCallPolicy` retry
    wraps AROUND this client — set ``max_retries=1`` here to keep exactly
    one retry layer, or leave both for the reference's nested behavior
    (client retries transport errors fast; the policy layer retries
    whole-call failures with longer backoff).
    """

    base_url: str = "http://localhost:11434"
    model: str = "llama3.2:3b"
    timeout_seconds: float = 30.0
    max_retries: int = 3
    temperature: float | None = 0.7
    max_tokens: int | None = 2000

    def _request_body(self, prompt: str) -> bytes:
        body: dict = {"model": self.model, "prompt": prompt, "stream": False}
        options: dict = {}
        if self.max_tokens is not None:
            options["num_predict"] = self.max_tokens
        if self.temperature is not None:
            options["temperature"] = self.temperature
        if options:
            body["options"] = options
        return json.dumps(body).encode("utf-8")

    def _complete_sync(self, prompt: str) -> str:
        url = self.base_url.rstrip("/") + "/api/generate"
        req = urllib.request.Request(
            url,
            data=self._request_body(prompt),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        last_err: Exception | None = None
        for attempt in range(1, self.max_retries + 1):
            try:
                with urllib.request.urlopen(
                    req, timeout=self.timeout_seconds
                ) as resp:
                    payload = json.loads(resp.read().decode("utf-8"))
                text = payload.get("response")
                if not isinstance(text, str):
                    # a well-formed HTTP answer with the wrong shape is a
                    # protocol error, not a transient fault — don't retry
                    # (mod.rs:109-114 returns immediately here too)
                    raise ValueError(
                        f"invalid Ollama response format: {payload!r}"
                    )
                return text
            except (json.JSONDecodeError, ValueError):
                # DELIBERATELY non-retryable, both arms: the wrong-shape
                # ValueError above (mod.rs:109-114) AND a garbled/truncated
                # body failing json.loads — the reference's `?` on
                # serde_json parse failure returns immediately without
                # retrying too (mod.rs:103-107). JSONDecodeError is a
                # ValueError subclass; it is named explicitly so the
                # no-retry-on-parse-error path reads as parity, not
                # accident.
                raise
            except Exception as e:  # noqa: BLE001 — transport-level fault
                last_err = e
                if attempt < self.max_retries:
                    time.sleep(0.1 * attempt)  # mod.rs:123: 100·attempt ms
        raise ConnectionError(
            f"Ollama API failed after {self.max_retries} retries: {last_err}"
        )

    async def acomplete(self, prompt: str) -> str:
        return await asyncio.to_thread(self._complete_sync, prompt)
