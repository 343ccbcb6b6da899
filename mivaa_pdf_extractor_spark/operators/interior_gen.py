"""Interior-design generation planning folds
(app/api/interior_design_routes.py) as native Spark joins — the network
generation itself is out of scope (SURVEY scoping); reproduced is every
deterministic decision around it:

- prompt build (:52-87): room = _ROOM_NAMES.get(room_type or '',
  room_type or 'interior space') — an UNKNOWN room_type passes through
  verbatim (pin); style_tags fall back to the style name itself;
  prompt.rstrip('.') strips ALL trailing dots; i2i uses the concise
  directive shape, t2i the rich 5-part shape;
- model selection (:670-684): explicit ids filter ALL_MODELS — and
  'gemini-interior' appears in BOTH capability lists, so selecting it
  explicitly yields TWO rows (pin); an image routes to the i2i list minus
  status=='failing' rows; otherwise the t2i list; exclusions apply AFTER;
  request_type uses underscores (:700);
- per-schema input dispatch (_build_model_input, :180-303): comfyui /
  stable_interiors / sdxl_interior REQUIRE an image (ValueError rows →
  verdict 'requires_image'); interior_ai sends the image under the
  'input' key (pin); flux_lora prepends the trigger word only when
  truthy AND not already a substring of the prompt (pin); flux without an
  image adds aspect_ratio 16:9; virtual_staging maps room/style enums
  with 'Living Room' / 'Default (AI decides)' defaults; playground fixes
  guidance 3.0 + DPMSolver++ + negative prompt; generic adds w/h/
  num_outputs only for t2i and image+strength only for i2i;
- result shape (atomic_update_model_result, :497-514): status
  completed/failed; image_urls = [url] only when success AND url (a
  successful call with no url emits NO image_urls — pin); failures with
  an error get error + image_urls=[] (an error-less failure gets
  neither — pin).

Scale: the model table is a literal broadcast dimension; selection and
dispatch are one broadcast join + map-side when-chains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ROOM_NAMES = (
    ("living_room", "living room"), ("bedroom", "bedroom"),
    ("kitchen", "kitchen"), ("bathroom", "bathroom"),
    ("dining_room", "dining room"), ("home_office", "home office"),
    ("hallway", "hallway"), ("studio", "studio apartment"),
    ("outdoor", "outdoor terrace"), ("kids_room", "children's room"),
    ("basement", "basement lounge"),
)

STYLE_VOCAB = (
    ("modern", "modern, clean lines, sleek surfaces, contemporary "
     "furniture, neutral palette"),
    ("minimalist", "minimalist, ultra-clean, negative space, uncluttered, "
     "monochromatic tones"),
    ("scandinavian", "Scandinavian, Nordic, light oak wood, white walls, "
     "cozy hygge atmosphere"),
    ("industrial", "industrial loft, exposed concrete, raw steel accents, "
     "warehouse aesthetic"),
    ("luxury", "luxury, high-end finishes, marble surfaces, gold accents, "
     "designer furniture, opulent"),
    ("bohemian", "bohemian, eclectic layered textiles, warm earth tones, "
     "plants, woven accents"),
    ("traditional", "traditional, classic rich wood tones, ornate "
     "mouldings, symmetrical layout"),
    ("mediterranean", "Mediterranean, terracotta tiles, arched details, "
     "warm plaster walls, natural stone"),
    ("japandi", "Japandi, wabi-sabi, natural wood, muted pale palette, "
     "zen minimalism"),
    ("art_deco", "Art Deco, geometric patterns, brass accents, velvet "
     "upholstery, dramatic lighting"),
    ("rustic", "rustic, reclaimed wood, exposed beams, stone fireplace, "
     "warm cozy atmosphere"),
    ("coastal", "coastal, light airy, sandy tones, rattan furniture, "
     "linen textiles, sea-glass tones"),
)

VS_ROOM_MAP = (
    ("living_room", "Living Room"), ("bedroom", "Bedroom"),
    ("kitchen", "Kitchen"), ("bathroom", "Bathroom"),
    ("dining_room", "Dining Room"), ("home_office", "Office"),
    ("outdoor", "Garden"), ("hallway", "Living Room"),
    ("studio", "Living Room"), ("kids_room", "Bedroom"),
    ("basement", "Living Room"),
)
VS_ROOM_DEFAULT = "Living Room"

VS_STYLE_MAP = (
    ("modern", "Modern"), ("minimalist", "Modern"),
    ("scandinavian", "Scandinavian"), ("industrial", "Urban Industrial"),
    ("luxury", "Transitional Luxury"), ("bohemian", "Modern Organic"),
    ("traditional", "Traditional"), ("mediterranean", "Modern Organic"),
    ("japandi", "Scandinavian Oasis"), ("art_deco", "Mid-Century Modern"),
    ("rustic", "Farmhouse"), ("coastal", "Coastal"),
)
VS_STYLE_DEFAULT = "Default (AI decides)"

# (entry_ord, id, name, provider, capability, cost, input_schema,
#  trigger_word, status) — interior_design_routes.py:89-155; ALL_MODELS is
# the t2i list then the i2i list, and gemini-interior appears in BOTH.
MODELS = (
    (0, "gemini-interior", "Gemini 3 Flash Image", "gemini",
     "text-to-image", 0.0, "generic", "", ""),
    (1, "flux-2-pro", "FLUX.2 Pro", "replicate", "text-to-image", 0.05,
     "generic", "", ""),
    (2, "playground-v2.5", "Playground v2.5", "replicate", "text-to-image",
     0.01, "playground_v25", "", ""),
    (3, "sd3", "Stable Diffusion 3", "replicate", "text-to-image", 0.055,
     "generic", "", ""),
    (4, "gemini-interior", "Gemini 3 Flash Image", "gemini",
     "image-to-image", 0.0, "generic", "", "working"),
    (5, "comfyui-interior-remodel", "ComfyUI Interior Remodel",
     "replicate", "image-to-image", 0.02, "comfyui_interior", "",
     "working"),
    (6, "interiorly-gen1-dev", "Interiorly Gen1 Dev", "replicate",
     "image-to-image", 0.015, "flux_lora_interior", "", "working"),
    (7, "designer-architecture", "Designer Architecture", "replicate",
     "image-to-image", 0.018, "generic", "", "working"),
    (8, "interior-v2", "Interior V2", "replicate", "image-to-image", 0.02,
     "interior_v2", "", "working"),
    (9, "adirik-interior-design", "Adirik Interior Design", "replicate",
     "image-to-image", 0.02, "adirik_interior", "", "working"),
    (10, "erayyavuz-interior-ai", "Interior AI", "replicate",
     "image-to-image", 0.02, "interior_ai", "", "working"),
    (11, "interor-2", "Interior 2 (Flux)", "replicate", "image-to-image",
     0.014, "flux_lora_interior", "", "working"),
    (12, "colourful-interiors", "Colourful Interiors (Flux)", "replicate",
     "image-to-image", 0.014, "flux_lora_interior", "INTR", "working"),
    (13, "stable-interiors-v2-pb", "Stable Interiors V2", "replicate",
     "image-to-image", 0.011, "stable_interiors", "", "working"),
    (14, "stable-interiors-v2-yz", "Stable Interiors V2 (Fast)",
     "replicate", "image-to-image", 0.011, "stable_interiors", "",
     "working"),
    (15, "interior-design-sdxl", "Interior Design SDXL", "replicate",
     "image-to-image", 0.14, "sdxl_interior", "", "working"),
)

_MODEL_SCHEMA = ("entry_ord int, model_id string, name string, "
                 "provider string, capability string, cost double, "
                 "input_schema string, trigger_word string, status string")


def models_df(spark) -> DataFrame:
    return spark.createDataFrame(list(MODELS), _MODEL_SCHEMA)


MODELS_SQL = ("SELECT * FROM (VALUES " + ", ".join(
    "({}, '{}', '{}', '{}', '{}', {}, '{}', '{}', '{}')".format(*m)
    for m in MODELS)
    + ") AS m(entry_ord, model_id, name, provider, capability, cost, "
      "input_schema, trigger_word, status)")


def _lookup(pairs, expr: Column, default: Column) -> Column:
    out = default
    for k, v in reversed(pairs):
        out = F.when(expr == k, F.lit(v)).otherwise(out)
    return out


def _q(s: str) -> str:
    return s.replace("'", "''")


def _lookup_sql(pairs, expr: str, default: str) -> str:
    whens = " ".join(f"WHEN '{_q(k)}' THEN '{_q(v)}'" for k, v in pairs)
    return f"(CASE {expr} {whens} ELSE {default} END)"


def build_prompt() -> Column:
    """_build_generation_prompt (:52-87) from request columns prompt,
    room_type, style, image_url."""
    rt = F.coalesce(F.col("room_type"), F.lit(""))
    room = _lookup(ROOM_NAMES, rt,
                   F.when(rt != "", rt).otherwise(F.lit("interior space")))
    style_name = F.when(F.coalesce(F.col("style"), F.lit("")) != "",
                        F.col("style")).otherwise(F.lit("contemporary"))
    st = F.coalesce(F.col("style"), F.lit(""))
    tags = _lookup(STYLE_VOCAB, st, style_name)
    body = F.regexp_replace(F.col("prompt"), r"\.+$", "")
    i2i = F.coalesce(F.col("image_url"), F.lit("")) != ""
    return F.when(i2i, F.concat(
        style_name, F.lit(" style redesign of a "), room, F.lit(", "),
        body, F.lit(", "), tags,
        F.lit(", professional interior design, high quality rendering"))
    ).otherwise(F.concat(
        F.lit("Professional interior design photograph of a beautifully "
              "designed "), style_name, F.lit(" "), room, F.lit(", "),
        body, F.lit(", "), tags,
        F.lit(", soft natural and ambient lighting, photorealistic "
              "render, architectural photography, wide-angle lens, sharp "
              "focus, high detail, 8K resolution")))


def _prompt_sql() -> str:
    rt = "coalesce(room_type, '')"
    room = _lookup_sql(
        ROOM_NAMES, rt,
        f"CASE WHEN {rt} <> '' THEN {rt} ELSE 'interior space' END")
    style_name = ("CASE WHEN coalesce(style, '') <> '' THEN style "
                  "ELSE 'contemporary' END")
    tags = _lookup_sql(STYLE_VOCAB, "coalesce(style, '')", style_name)
    body = "regexp_replace(prompt, '\\.+$', '')"
    return f"""
        CASE WHEN coalesce(image_url, '') <> '' THEN
            {style_name} || ' style redesign of a ' || {room} || ', '
            || {body} || ', ' || {tags}
            || ', professional interior design, high quality rendering'
        ELSE
            'Professional interior design photograph of a beautifully '
            || 'designed ' || {style_name} || ' ' || {room} || ', '
            || {body} || ', ' || {tags}
            || ', soft natural and ambient lighting, photorealistic '
            || 'render, architectural photography, wide-angle lens, '
            || 'sharp focus, high detail, 8K resolution'
        END
    """


def select_models(reqs: DataFrame, models: DataFrame) -> DataFrame:
    """create_interior_design's selection ladder (:670-684) + prompt +
    request_type.  ``reqs``: (req_id, prompt, room_type, style, image_url,
    model_ids array<string> or null, exclude_ids array<string> or null)."""
    j = reqs.crossJoin(F.broadcast(models))
    has_explicit = F.col("model_ids").isNotNull() \
        & (F.size("model_ids") > 0)
    has_image = F.coalesce(F.col("image_url"), F.lit("")) != ""
    selected = (F.when(has_explicit,
                       F.array_contains(F.col("model_ids"),
                                        F.col("model_id")))
                .when(has_image, (F.col("capability") == "image-to-image")
                      & (F.col("status") != "failing"))
                .otherwise(F.col("capability") == "text-to-image"))
    excluded = F.col("exclude_ids").isNotNull() \
        & F.array_contains(F.col("exclude_ids"), F.col("model_id"))
    out = j.where(selected & ~excluded)
    return out.select(
        "req_id", "entry_ord", "model_id", "name", "provider",
        "capability", "input_schema",
        F.when(has_image, "image_to_image").otherwise("text_to_image")
        .alias("request_type"),
        build_prompt().alias("enhanced_prompt"))


def select_models_sql(reqs: str) -> str:
    return f"""
        WITH r AS ({reqs}), m AS ({MODELS_SQL}),
        j AS (SELECT * FROM r CROSS JOIN m),
        s AS (
          SELECT *,
                 CASE WHEN model_ids IS NOT NULL AND len(model_ids) > 0
                      THEN list_contains(model_ids, model_id)
                      WHEN coalesce(image_url, '') <> ''
                      THEN capability = 'image-to-image'
                           AND status <> 'failing'
                      ELSE capability = 'text-to-image' END AS sel,
                 exclude_ids IS NOT NULL
                     AND list_contains(exclude_ids, model_id) AS excl
          FROM j)
        SELECT req_id, entry_ord, model_id, name, provider, capability,
               input_schema,
               CASE WHEN coalesce(image_url, '') <> ''
                    THEN 'image_to_image' ELSE 'text_to_image' END
                   AS request_type,
               ({_prompt_sql()}) AS enhanced_prompt
        FROM s WHERE sel AND NOT excl
    """


def build_model_inputs(selected: DataFrame) -> DataFrame:
    """_build_model_input (:180-303) over selection rows (which carry
    input_schema, enhanced_prompt, and the request's image_url/room_type/
    style via re-join upstream).  Emits the parameter superset with NULLs
    where a schema omits a param."""
    sch = F.col("input_schema")
    img = F.coalesce(F.col("image_url"), F.lit(""))
    has_img = img != ""
    p = F.col("enhanced_prompt")
    trig = F.col("trigger_word")
    flux_prompt = F.when((trig != "") & ~p.contains(trig),
                         F.concat(trig, F.lit(" "), p)).otherwise(p)
    verdict = F.when(
        sch.isin("comfyui_interior", "stable_interiors", "sdxl_interior")
        & ~has_img, F.lit("requires_image")).otherwise(F.lit("ok"))
    steps = (F.when(sch == "adirik_interior", 25)
             .when(sch == "interior_ai", 30)
             .when(sch == "flux_lora_interior", 28)
             .when(sch == "stable_interiors", 50)
             .when(sch == "sdxl_interior", 50)
             .when(sch == "playground_v25", 50)
             .when(sch.isin("comfyui_interior", "interior_v2",
                            "virtual_staging"), F.lit(None).cast("int"))
             .otherwise(25))
    guidance = (F.when(sch == "adirik_interior", 7.5)
                .when(sch == "interior_ai", 7.5)
                .when(sch == "flux_lora_interior", 3.0)
                .when(sch == "stable_interiors", 15.0)
                .when(sch == "sdxl_interior", 7.5)
                .when(sch == "playground_v25", 3.0)
                .when(sch.isin("comfyui_interior", "interior_v2",
                               "virtual_staging"),
                      F.lit(None).cast("double"))
                .otherwise(7.5))
    prompt_strength = (F.when(sch == "adirik_interior", 0.8)
                       .when((sch == "flux_lora_interior") & has_img, 0.8)
                       .when((sch == "stable_interiors") & has_img, 0.8))
    strength = (F.when((sch == "interior_ai") & has_img, 0.8)
                .when((sch == "generic")
                      & (F.col("capability") == "image-to-image")
                      & has_img, 0.8))
    image_param = (F.when(sch == "interior_ai",
                          F.when(has_img, "input"))
                   .when(sch.isin("comfyui_interior", "stable_interiors",
                                  "sdxl_interior"),
                         F.when(has_img, "image"))
                   .when(sch == "virtual_staging", F.lit("image"))
                   .when(sch.isin("adirik_interior", "interior_v2",
                                  "flux_lora_interior"),
                         F.when(has_img, "image"))
                   .when((sch == "generic")
                         & (F.col("capability") == "image-to-image")
                         & has_img, "image"))
    aspect = F.when((sch == "flux_lora_interior") & ~has_img, "16:9")
    t2i_generic = (sch == "generic") \
        & (F.col("capability") == "text-to-image")
    width = F.when(sch == "playground_v25", F.col("width")) \
        .when(t2i_generic, F.col("width"))
    height = F.when(sch == "playground_v25", F.col("height")) \
        .when(t2i_generic, F.col("height"))
    num_outputs = F.when(sch == "playground_v25", 1).when(t2i_generic, 1)
    scheduler = F.when(sch == "playground_v25", "DPMSolver++")
    rt = F.coalesce(F.col("room_type"), F.lit(""))
    st = F.coalesce(F.col("style"), F.lit(""))
    room = F.when(sch == "virtual_staging",
                  _lookup(VS_ROOM_MAP, rt, F.lit(VS_ROOM_DEFAULT)))
    fstyle = F.when(sch == "virtual_staging",
                    _lookup(VS_STYLE_MAP, st, F.lit(VS_STYLE_DEFAULT)))
    final_prompt = F.when(sch == "flux_lora_interior", flux_prompt) \
        .otherwise(p)
    return selected.select(
        "req_id", "entry_ord", "model_id", "input_schema",
        verdict.alias("verdict"),
        F.when(verdict == "ok", final_prompt).alias("final_prompt"),
        F.when(verdict == "ok", steps).alias("steps"),
        F.when(verdict == "ok", guidance).alias("guidance"),
        F.when(verdict == "ok", prompt_strength).alias("prompt_strength"),
        F.when(verdict == "ok", strength).alias("strength"),
        F.when(verdict == "ok", image_param).alias("image_param"),
        F.when(verdict == "ok", aspect).alias("aspect_ratio"),
        F.when(verdict == "ok", width).alias("width_out"),
        F.when(verdict == "ok", height).alias("height_out"),
        F.when(verdict == "ok", num_outputs).alias("num_outputs"),
        F.when(verdict == "ok", scheduler).alias("scheduler"),
        F.when(verdict == "ok", room).alias("vs_room"),
        F.when(verdict == "ok", fstyle).alias("vs_style"))


def build_model_inputs_sql(selected: str) -> str:
    vs_room = _lookup_sql(VS_ROOM_MAP, "coalesce(room_type, '')",
                          f"'{VS_ROOM_DEFAULT}'")
    vs_style = _lookup_sql(VS_STYLE_MAP, "coalesce(style, '')",
                           f"'{VS_STYLE_DEFAULT}'")
    return f"""
        WITH s AS ({selected}),
        b AS (
          SELECT *,
                 coalesce(image_url, '') <> '' AS has_img,
                 CASE WHEN input_schema IN ('comfyui_interior',
                          'stable_interiors', 'sdxl_interior')
                          AND coalesce(image_url, '') = ''
                      THEN 'requires_image' ELSE 'ok' END AS verdict,
                 CASE WHEN input_schema = 'flux_lora_interior'
                          AND trigger_word <> ''
                          AND NOT contains(enhanced_prompt, trigger_word)
                      THEN trigger_word || ' ' || enhanced_prompt
                      ELSE enhanced_prompt END AS fp
          FROM s)
        SELECT req_id, entry_ord, model_id, input_schema, verdict,
               CASE WHEN verdict = 'ok' THEN fp END AS final_prompt,
               CASE WHEN verdict <> 'ok' THEN NULL
                    WHEN input_schema = 'adirik_interior' THEN 25
                    WHEN input_schema = 'interior_ai' THEN 30
                    WHEN input_schema = 'flux_lora_interior' THEN 28
                    WHEN input_schema IN ('stable_interiors',
                        'sdxl_interior', 'playground_v25') THEN 50
                    WHEN input_schema IN ('comfyui_interior',
                        'interior_v2', 'virtual_staging') THEN NULL
                    ELSE 25 END AS steps,
               CASE WHEN verdict <> 'ok' THEN NULL
                    WHEN input_schema IN ('adirik_interior',
                        'interior_ai', 'sdxl_interior') THEN 7.5
                    WHEN input_schema = 'flux_lora_interior' THEN 3.0
                    WHEN input_schema = 'stable_interiors' THEN 15.0
                    WHEN input_schema = 'playground_v25' THEN 3.0
                    WHEN input_schema IN ('comfyui_interior',
                        'interior_v2', 'virtual_staging') THEN NULL
                    ELSE 7.5 END AS guidance,
               CASE WHEN verdict <> 'ok' THEN NULL
                    WHEN input_schema = 'adirik_interior' THEN 0.8
                    WHEN input_schema IN ('flux_lora_interior',
                        'stable_interiors') AND has_img THEN 0.8
                    END AS prompt_strength,
               CASE WHEN verdict <> 'ok' THEN NULL
                    WHEN input_schema = 'interior_ai' AND has_img THEN 0.8
                    WHEN input_schema = 'generic'
                         AND capability = 'image-to-image' AND has_img
                    THEN 0.8 END AS strength,
               CASE WHEN verdict <> 'ok' THEN NULL
                    WHEN input_schema = 'interior_ai' AND has_img
                    THEN 'input'
                    WHEN input_schema = 'virtual_staging' THEN 'image'
                    WHEN input_schema IN ('comfyui_interior',
                        'stable_interiors', 'sdxl_interior',
                        'adirik_interior', 'interior_v2',
                        'flux_lora_interior') AND has_img THEN 'image'
                    WHEN input_schema = 'generic'
                         AND capability = 'image-to-image' AND has_img
                    THEN 'image' END AS image_param,
               CASE WHEN verdict = 'ok'
                         AND input_schema = 'flux_lora_interior'
                         AND NOT has_img THEN '16:9' END AS aspect_ratio,
               CASE WHEN verdict <> 'ok' THEN NULL
                    WHEN input_schema = 'playground_v25'
                         OR (input_schema = 'generic'
                             AND capability = 'text-to-image')
                    THEN width END AS width_out,
               CASE WHEN verdict <> 'ok' THEN NULL
                    WHEN input_schema = 'playground_v25'
                         OR (input_schema = 'generic'
                             AND capability = 'text-to-image')
                    THEN height END AS height_out,
               CASE WHEN verdict <> 'ok' THEN NULL
                    WHEN input_schema = 'playground_v25'
                         OR (input_schema = 'generic'
                             AND capability = 'text-to-image')
                    THEN 1 END AS num_outputs,
               CASE WHEN verdict = 'ok'
                         AND input_schema = 'playground_v25'
                    THEN 'DPMSolver++' END AS scheduler,
               CASE WHEN verdict = 'ok'
                         AND input_schema = 'virtual_staging'
                    THEN {vs_room} END AS vs_room,
               CASE WHEN verdict = 'ok'
                         AND input_schema = 'virtual_staging'
                    THEN {vs_style} END AS vs_style
        FROM b
    """


def model_result_shape(results: DataFrame) -> DataFrame:
    """atomic_update_model_result's payload shape (:497-514).

    ``results``: (res_id, model_id, success, image_url, cost, error).
    The image_urls list is flattened to a string for the contract:
    the url for [url], '' for [], NULL when the key is ABSENT — the
    success-without-url and failure-without-error rows carry NO
    image_urls key (pin)."""
    ok = F.col("success")
    url = F.coalesce(F.col("image_url"), F.lit(""))
    err = F.coalesce(F.col("error"), F.lit(""))
    return results.select(
        "res_id", "model_id",
        F.when(ok, "completed").otherwise("failed").alias("status"),
        F.col("cost"),
        F.when(ok & (url != ""), F.col("image_url"))
        .when(~ok & (err != ""), F.lit(""))
        .alias("image_urls"),
        F.when(~ok & (err != ""), F.col("error")).alias("error_out"))


def model_result_shape_sql(results: str) -> str:
    return f"""
        SELECT res_id, model_id,
               CASE WHEN success THEN 'completed' ELSE 'failed' END
                   AS status,
               cost,
               CASE WHEN success AND coalesce(image_url, '') <> ''
                    THEN image_url
                    WHEN NOT success AND coalesce(error, '') <> ''
                    THEN '' END AS image_urls,
               CASE WHEN NOT success AND coalesce(error, '') <> ''
                    THEN error END AS error_out
        FROM ({results})
    """


def model_inputs_plan(reqs: DataFrame, models: DataFrame) -> DataFrame:
    """Compose selection + request/model re-join + input dispatch."""
    sel = select_models(reqs, models)
    joined = (sel
              .join(reqs.select("req_id", "image_url", "room_type",
                                "style", "width", "height"), "req_id")
              .join(F.broadcast(models.select("entry_ord",
                                              "trigger_word")),
                    "entry_ord"))
    return build_model_inputs(joined)


def model_inputs_plan_sql(reqs: str) -> str:
    joined = f"""
        SELECT sel.*, r.image_url, r.room_type, r.style, r.width,
               r.height, m.trigger_word
        FROM ({select_models_sql(reqs)}) sel
        JOIN ({reqs}) r USING (req_id)
        JOIN ({MODELS_SQL}) m USING (entry_ord)
    """
    return build_model_inputs_sql(joined)


# ---------------------------------------------------------------------------
# synthesizers
# ---------------------------------------------------------------------------

def synth_requests(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    req = e % 24
    prompt = (F.when(req % 3 == 0, F.lit("warm tones with oak floors..."))
              .when(req % 3 == 1, F.lit("INTR loft with plants"))
              .otherwise(F.lit("cozy reading nook")))
    room = (F.when(req % 5 == 0, F.lit(None).cast("string"))
            .when(req % 5 == 1, F.lit(""))
            .when(req % 5 == 2, F.lit("kitchen"))
            .when(req % 5 == 3, F.lit("server_room"))   # unknown passthrough
            .otherwise(F.lit("kids_room")))
    style = (F.when(req % 4 == 0, F.lit(None).cast("string"))
             .when(req % 4 == 1, F.lit("japandi"))
             .when(req % 4 == 2, F.lit("brutalist"))    # unknown -> itself
             .otherwise(F.lit("coastal")))
    img = F.when(req % 2 == 0,
                 F.concat(F.lit("https://img.example/"),
                          req.cast("string"))).otherwise(
        F.lit(None).cast("string"))
    mids = (F.when(req % 6 == 0,
                   F.array(F.lit("gemini-interior"), F.lit("sd3")))
            .when(req % 6 == 1, F.array(F.lit("interor-2"),
                                        F.lit("erayyavuz-interior-ai"),
                                        F.lit("stable-interiors-v2-pb")))
            .otherwise(F.lit(None).cast("array<string>")))
    excl = F.when(req % 7 == 0, F.array(F.lit("gemini-interior"))) \
        .otherwise(F.lit(None).cast("array<string>"))
    return (events.where(e < 24).select(
        req.alias("req_id"), prompt.alias("prompt"),
        room.alias("room_type"), style.alias("style"),
        img.alias("image_url"), mids.alias("model_ids"),
        excl.alias("exclude_ids"),
        F.lit(1024).alias("width"), F.lit(768).alias("height")))


SYNTH_REQUESTS_SQL = """
    SELECT event_id % 24 AS req_id,
           CASE WHEN event_id % 24 % 3 = 0
                THEN 'warm tones with oak floors...'
                WHEN event_id % 24 % 3 = 1 THEN 'INTR loft with plants'
                ELSE 'cozy reading nook' END AS prompt,
           CASE WHEN event_id % 24 % 5 = 0 THEN NULL
                WHEN event_id % 24 % 5 = 1 THEN ''
                WHEN event_id % 24 % 5 = 2 THEN 'kitchen'
                WHEN event_id % 24 % 5 = 3 THEN 'server_room'
                ELSE 'kids_room' END AS room_type,
           CASE WHEN event_id % 24 % 4 = 0 THEN NULL
                WHEN event_id % 24 % 4 = 1 THEN 'japandi'
                WHEN event_id % 24 % 4 = 2 THEN 'brutalist'
                ELSE 'coastal' END AS style,
           CASE WHEN event_id % 24 % 2 = 0
                THEN 'https://img.example/'
                     || CAST(event_id % 24 AS VARCHAR) END AS image_url,
           CASE WHEN event_id % 24 % 6 = 0
                THEN ['gemini-interior', 'sd3']
                WHEN event_id % 24 % 6 = 1
                THEN ['interor-2', 'erayyavuz-interior-ai',
                      'stable-interiors-v2-pb'] END AS model_ids,
           CASE WHEN event_id % 24 % 7 = 0 THEN ['gemini-interior'] END
               AS exclude_ids,
           1024 AS width, 768 AS height
    FROM events WHERE event_id < 24
"""


def synth_results(events: DataFrame) -> DataFrame:
    e = F.col("event_id")
    url = (F.when(e % 4 == 0, F.lit(None).cast("string"))
           .when(e % 4 == 1, F.lit(""))
           .otherwise(F.concat(F.lit("https://out.example/"),
                               (e % 50).cast("string"))))
    err = (F.when(e % 5 == 0, F.lit(None).cast("string"))
           .when(e % 5 == 1, F.lit(""))
           .otherwise(F.lit("model timeout")))
    return events.select(
        e.alias("res_id"),
        F.concat(F.lit("m"), (e % 16).cast("string")).alias("model_id"),
        (e % 3 != 0).alias("success"), url.alias("image_url"),
        ((e % 15).cast("double") / 100).alias("cost"), err.alias("error"))


SYNTH_RESULTS_SQL = """
    SELECT event_id AS res_id,
           'm' || CAST(event_id % 16 AS VARCHAR) AS model_id,
           event_id % 3 <> 0 AS success,
           CASE WHEN event_id % 4 = 0 THEN NULL
                WHEN event_id % 4 = 1 THEN ''
                ELSE 'https://out.example/'
                     || CAST(event_id % 50 AS VARCHAR) END AS image_url,
           CAST(event_id % 15 AS DOUBLE) / 100 AS cost,
           CASE WHEN event_id % 5 = 0 THEN NULL
                WHEN event_id % 5 = 1 THEN ''
                ELSE 'model timeout' END AS error
    FROM events
"""
