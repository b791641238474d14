"""Chat-template registry.

Declarative templates (system/user/assistant headers + terminators) for
rendering conversations and locating assistant spans for loss masks —
reference: specforge/data/template.py:7-29 and the per-model templates it
registers. Register new templates with :func:`register_template`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional


@dataclass(frozen=True)
class ChatTemplate:
    name: str
    system_header: str
    user_header: str
    assistant_header: str
    end_token: str
    default_system_prompt: Optional[str] = None

    def render_system(self, content: str) -> str:
        return f"{self.system_header}{content}{self.end_token}"

    def render_user(self, content: str) -> str:
        return f"{self.user_header}{content}{self.end_token}"

    def render_assistant_header(self) -> str:
        return self.assistant_header

    def render_assistant_body(self, content: str) -> str:
        return f"{content}{self.end_token}"


_TEMPLATES: Dict[str, ChatTemplate] = {}


def register_template(template: ChatTemplate) -> ChatTemplate:
    _TEMPLATES[template.name] = template
    return template


def get_template(name: str) -> ChatTemplate:
    if name not in _TEMPLATES:
        raise KeyError(
            f"unknown chat template {name!r}; known: {sorted(_TEMPLATES)}"
        )
    return _TEMPLATES[name]


def template_names():
    return sorted(_TEMPLATES)


register_template(ChatTemplate(
    name="llama3",
    system_header="<|start_header_id|>system<|end_header_id|>\n\n",
    user_header="<|start_header_id|>user<|end_header_id|>\n\n",
    assistant_header="<|start_header_id|>assistant<|end_header_id|>\n\n",
    end_token="<|eot_id|>",
    default_system_prompt="You are a helpful assistant.",
))

# ChatML family: qwen / qwen2 / qwen3
for _name in ("qwen", "qwen2", "qwen3", "chatml"):
    register_template(ChatTemplate(
        name=_name,
        system_header="<|im_start|>system\n",
        user_header="<|im_start|>user\n",
        assistant_header="<|im_start|>assistant\n",
        end_token="<|im_end|>\n",
        default_system_prompt="You are a helpful assistant.",
    ))

register_template(ChatTemplate(
    name="deepseek",
    system_header="",
    user_header="<｜User｜>",
    assistant_header="<｜Assistant｜>",
    end_token="<｜end▁of▁sentence｜>",
))

register_template(ChatTemplate(
    name="raw",
    system_header="",
    user_header="",
    assistant_header="",
    end_token="",
))

register_template(ChatTemplate(
    name="glm",
    system_header="<|system|>\n",
    user_header="<|user|>\n",
    assistant_header="<|assistant|>\n",
    end_token="",
))

register_template(ChatTemplate(
    name="gemma",
    system_header="",
    user_header="<start_of_turn>user\n",
    assistant_header="<start_of_turn>model\n",
    end_token="<end_of_turn>\n",
))
