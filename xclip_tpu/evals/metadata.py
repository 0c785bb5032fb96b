"""Evaluation metadata: ImageNet class names + prompt-ensemble templates.

The string lists live in ``metadata.json`` (public OpenAI prompt/classname
data). Two classname variants exist and both are preserved because they
differ in 4 entries (eft/newt, maillot/tights, projectile/missile,
sunglass/sunglasses):

- ``IMAGENET_CLASSNAMES`` — open_clip's list, used by the in-training
  zero-shot eval (reference: deps/open_clip/src/open_clip/
  zero_shot_metadata.py:99).
- ``XCLIP_IMAGENET_CLASSES`` — xclip's list, used by the DomainNet-LSO
  evaluation scripts (reference: xclip/datasets.py:13-1014).

``OPENAI_IMAGENET_TEMPLATES`` is the 80-template ensemble
(zero_shot_metadata.py:2); ``XCLIP_OPENAI_TEMPLATES`` is xclip's 86-template
variant adding clipart/infograph/quickdraw prompts (xclip/zero_shot.py:113-200).
"""

import json
import pathlib

_DATA = json.loads((pathlib.Path(__file__).parent / "metadata.json").read_text())

IMAGENET_CLASSNAMES = _DATA["imagenet_classnames"]
XCLIP_IMAGENET_CLASSES = _DATA["xclip_imagenet_classes"]
OPENAI_IMAGENET_TEMPLATES = _DATA["openai_imagenet_templates"]
XCLIP_OPENAI_TEMPLATES = _DATA["xclip_openai_templates"]

# domain-specific template keywords used by the domain_invariant filter
# (reference: xclip/zero_shot.py:216-221)
DOMAIN_TEMPLATE_KEYWORDS = ["clipart", "infograph", "painting", "quickdraw", "sketch"]
