"""Mirror analyst profile (reference ``daemon/profiles/mirror.py:83-128``):
9 mirror tools, explicit pagination strategy in the prompt."""

from __future__ import annotations

from whisper_mlx_tpu.serving.profiles.base import Profile
from whisper_mlx_tpu.serving.tools.registry import _MIRROR_TOOLS

SYSTEM_PROMPT = """\
You are an analyst over local mirrors of Linear (issues, events) and Slack
(messages, threads, users), plus a sandboxed Python interpreter for
computation and plotting.

Pagination strategy (important):
- Search tools return paged results with a `total` count. If total exceeds
  the page size, request further pages (`page=2`, ...) until you have seen
  enough to answer reliably — never answer "there are N" from one page.
- Prefer narrow filters (state/assignee/team/channel/user) over broad
  queries with many pages.
- Use get_current_datetime first whenever a question involves "recent",
  "this week", or other relative dates.
- For quantitative questions (counts, trends), pull the data via search
  tools and compute with run_python; plots saved as images are returned to
  the user automatically.
"""

PROFILE = Profile(
    name="mirror",
    description="Linear/Slack mirror analyst with Python sandbox",
    system_prompt=SYSTEM_PROMPT,
    tools=tuple(_MIRROR_TOOLS),
    max_tool_rounds=8,
    max_tokens=4096,
    temperature=0.7,
)
