"""DXF OGR-style-string generation (PEN/BRUSH/LABEL).

Transcribes the reference's style machinery:
* OGRDXFFeature::GetColor (ogr/ogrsf_frmts/dxf/ogrdxf_feature.cpp:136-401):
  ByLayer/ByBlock/true-color/indexed resolution with hidden-layer alpha
  and transparency, including the BYLAYER_FORCE0 special case.
* OGRDXFLayer::PrepareLineStyle / PrepareBrushStyle / PrepareFeatureStyle
  (ogrdxflayer.cpp:248-530): lineweight + LTYPE dash patterns, brush
  foreground color, LABEL color surgery.
* ACAdjustText (ogr_autocad_services.cpp:612-720): angle/size/width/dx/dy
  adjustment of LABEL styles during block insertion.
* ACGetColorTable (ogr_autocad_services.cpp:214-480): the AutoCAD Color
  Index table, embedded below as packed RGB bytes.
"""

from __future__ import annotations

_AC_COLORS = bytes.fromhex(
    "000000ff0000ffff0000ff0000ffff0000ffff00ff0000007f7f7fbfbfbfff00"
    "00ff7f7fa50000a552527f00007f3f3f4c00004c2626260000261313ff3f00ff"
    "9f7fa52900a567527f1f007f4f3f4c13004c2f26260900261713ff7f00ffbf7f"
    "a55200a57c527f3f007f5f3f4c26004c3926261300261c13ffbf00ffdf7fa57c"
    "00a591527f5f007f6f3f4c39004c4226261c00262113ffff00ffff7fa5a500a5"
    "a5527f7f007f7f3f4c4c004c4c26262600262613bfff00dfff7f7ca50091a552"
    "5f7f006f7f3f394c00424c261c26002126137fff00bfff7f52a5007ca5523f7f"
    "005f7f3f264c00394c261326001c26133fff009fff7f29a50067a5521f7f004f"
    "7f3f134c002f4c2609260017261300ff007fff7f00a50052a552007f003f7f3f"
    "004c00264c2600260013261300ff3f7fff9f00a52952a567007f1f3f7f4f004c"
    "13264c2f00260913261700ff7f7fffbf00a55252a57c007f3f3f7f5f004c2626"
    "4c3900261313261c00ffbf7fffdf00a57c52a591007f5f3f7f6f004c39264c42"
    "00261c13262100ffff7fffff00a5a552a5a5007f7f3f7f7f004c4c264c4c0026"
    "2613262600bfff7fdfff007ca55291a5005f7f3f6f7f00394c26424c001c2613"
    "2126007fff7fbfff0052a5527ca5003f7f3f5f7f00264c26394c001326131c26"
    "003fff7f9fff0029a55267a5001f7f3f4f7f00134c262f4c0009261317260000"
    "ff7f7fff0000a55252a500007f3f3f7f00004c26264c0000261313263f00ff9f"
    "7fff2900a56752a51f007f4f3f7f13004c2f264c0900261713267f00ffbf7fff"
    "5200a57c52a53f007f5f3f7f26004c39264c1300261c1326bf00ffdf7fff7c00"
    "a59152a55f007f6f3f7f39004c42264c1c0026211326ff00ffff7fffa500a5a5"
    "52a57f007f7f3f7f4c004c4c264c260026261326ff00bfff7fdfa5007ca55291"
    "7f005f7f3f6f4c00394c264226001c261321ff007fff7fbfa50052a5527c7f00"
    "3f7f3f5f4c00264c263926001326131cff003fff7f9fa50029a552677f001f7f"
    "3f4f4c00134c262f260009261317545454767676989898bababadcdcdcffffff"
)

_BYLAYER = 256
_BYBLOCK = 0
_TRUECOLOR = -100
_BYLAYER_FORCE0 = -101

import re as _re

_INT_RE = _re.compile(r"^\s*[-+]?\d+")
_FLOAT_RE = _re.compile(r"^\s*[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?")


def _atoi(s) -> int:
    """C atoi: parse the leading integer, 0 on failure."""
    m = _INT_RE.match(str(s) if s is not None else "")
    return int(m.group(0)) if m else 0


def _atof(s) -> float:
    """CPLAtof: parse the leading float, 0.0 on failure."""
    m = _FLOAT_RE.match(str(s) if s is not None else "")
    return float(m.group(0)) if m else 0.0



def _g(fmt: str, v: float) -> str:
    """CPLsnprintf %.Ng equivalent."""
    return fmt % v


def feature_color(sp: dict, layer: str, layers: dict,
                  bsp: dict | None = None, blayer: str | None = None) -> str:
    """OGRDXFFeature::GetColor: hex color for a feature. ``sp`` is the
    feature's style-property dict (mutated exactly like the reference's
    oStyleProperties so re-resolution during nested insertion sees the
    inherited values); ``bsp``/``blayer`` give the owning block-insert
    feature's properties and layer when regenerating styles during
    block insertion."""
    hidden = 0
    if "Hidden" in sp or (bsp is not None and "Hidden" in bsp):
        hidden = 1
        sp["Hidden"] = "1"
    else:
        lh = layers.get(layer, {}).get("Hidden")
        if lh:
            hidden = _atoi(lh)
        if not hidden and bsp is not None:
            bh = layers.get(blayer or "", {}).get("Hidden")
            if bh and _atoi(bh) == 2:
                hidden = 2
        if hidden == 2 and layer != "0":
            sp["Hidden"] = "1"

    ncolor, ntrue = _BYLAYER, 0
    if "TrueColor" in sp:
        ntrue = _atoi(sp["TrueColor"])
        ncolor = _TRUECOLOR
    elif "Color" in sp:
        ncolor = _atoi(sp["Color"])

    # MULTILEADER colors are raw 32-bit AcCmEntityColor structs
    method = (ncolor & 0xFFFFFFFF) >> 24 if ncolor not in (
        _TRUECOLOR,) else 0
    if method == 0xC0:
        ncolor = _BYLAYER
    elif method == 0xC1:
        ncolor = _BYBLOCK
    elif method == 0xC2:
        ntrue = ncolor & 0xFFFFFF
        ncolor = _TRUECOLOR
    elif method == 0xC3:
        ncolor &= 0xFF

    if ncolor == _BYBLOCK and bsp is not None:
        if "TrueColor" in bsp:
            ntrue = _atoi(bsp["TrueColor"])
            ncolor = _TRUECOLOR
            sp["TrueColor"] = bsp["TrueColor"]
        elif "Color" in bsp:
            ncolor = _atoi(bsp["Color"])
            sp["Color"] = bsp["Color"]
        else:
            # owning block has no explicit color: ByLayer, but taking
            # the color from the owning block's layer
            ncolor = _BYLAYER
            layer = blayer if blayer is not None else layer
            sp["Color"] = str(_BYLAYER_FORCE0)

    if ncolor == _BYLAYER_FORCE0:
        layer = (blayer if blayer is not None else "") if bsp is not None \
            else "0"
        ncolor = _BYLAYER

    if ncolor == _BYLAYER:
        lt = layers.get(layer, {})
        if "TrueColor" in lt:
            ntrue = _atoi(lt["TrueColor"])
            ncolor = _TRUECOLOR
            if bsp is not None and layer != "0":
                sp["TrueColor"] = lt["TrueColor"]
        elif "Color" in lt:
            ncolor = _atoi(lt["Color"])
            if bsp is not None and layer != "0":
                sp["Color"] = lt["Color"]

    if ncolor != _TRUECOLOR and not (1 <= ncolor <= 255):
        ncolor = 7

    if ncolor == _TRUECOLOR:
        res = "#%06x" % (ntrue & 0xFFFFFF)
    else:
        res = "#%02x%02x%02x" % tuple(_AC_COLORS[ncolor * 3:ncolor * 3 + 3])

    if hidden:
        res += "00"
    else:
        opacity = -1
        if "Transparency" in sp:
            tr = _atoi(sp["Transparency"])
            if tr & 0x02000000:
                opacity = tr & 0xFF
            elif tr & 0x01000000:  # ByBlock
                if bsp is not None and "Transparency" in bsp:
                    opacity = _atoi(bsp["Transparency"]) & 0xFF
                    sp["Transparency"] = bsp["Transparency"]
        else:
            ltr = layers.get(layer, {}).get("Transparency")
            if ltr is not None:
                opacity = _atoi(ltr) & 0xFF
                if bsp is not None and layer != "0":
                    sp["Transparency"] = ltr
        if opacity >= 0:
            res += "%02x" % (opacity & 0xFF)
    return res


def pen_style(feat: dict, layers: dict, linetypes: dict, ltscale: float,
              bfeat: dict | None = None) -> str:
    """OGRDXFLayer::PrepareLineStyle: PEN(c:<color>[,w:<weight>g]
    [,p:"<pattern>"]). ``feat`` is a parsed feature dict carrying
    ``_sp`` style properties, ``Layer`` and ``Linetype`` fields."""
    sp = feat.setdefault("_sp", {})
    layer = feat.get("Layer", "0")
    bsp = bfeat.get("_sp", {}) if bfeat is not None else None
    blayer = bfeat.get("Layer", "0") if bfeat is not None else None

    weight = sp.get("LineWeight", "-1")
    if _atof(weight) == -2 and bfeat is not None:
        if "LineWeight" in (bsp or {}):
            weight = bsp["LineWeight"]
            sp["LineWeight"] = weight
        else:
            weight = "-1"
    if _atof(weight) == -1:
        weight = layers.get(layer, {}).get("LineWeight", "")
    wnum = _atof(weight) / 100.0

    # The raw linetype is the entity's code-6 value ("" when absent;
    # "_lt" preserves it against the display-field ByLayer default).
    # Only an ABSENT linetype resolves through the layer; explicit
    # ByLayer/ByBlock names are literal LTYPE-table lookups, which hit
    # the standard dash-less entries (ogrdxflayer.cpp:464-483).
    linetype = feat.get("_lt")
    if linetype is None:
        linetype = feat.get("Linetype", "") or ""
    if linetype.upper() == "BYBLOCK" and bfeat is not None:
        linetype = bfeat.get("_lt")
        if linetype is None:
            linetype = bfeat.get("Linetype", "") or ""
        if linetype:
            feat["Linetype"] = linetype
            feat["_lt"] = linetype
    if not linetype:
        linetype = layers.get(layer, {}).get("Linetype", "") or ""

    scale = ltscale * _atof(sp.get("LinetypeScale", "1") or "1")
    dashes = linetypes.get(linetype, [])
    pattern = " ".join(
        _g("%.11g", abs(d) * scale) + "g" for d in dashes
    )

    style = "PEN(c:" + feature_color(sp, layer, layers, bsp, blayer)
    if wnum > 0.0:
        style += ",w:" + _g("%.2g", wnum) + "g"
    if pattern:
        style += ',p:"' + pattern + '"'
    return style + ")"


def brush_style(feat: dict, layers: dict, bfeat: dict | None = None) -> str:
    """OGRDXFLayer::PrepareBrushStyle (ogrdxflayer.cpp:291-407):
    foreground color, hatch background color (indexed/true color),
    ANSI31/ANSI37 pattern ids keyed on the pattern rotation, pattern
    scale, and the transparent-fill ogr-brush-1 special case."""
    sp = feat.setdefault("_sp", {})
    bsp = bfeat.get("_sp", {}) if bfeat is not None else None
    blayer = bfeat.get("Layer", "0") if bfeat is not None else None
    fc = feature_color(sp, feat.get("Layer", "0"), layers, bsp, blayer)
    style = "BRUSH(fc:" + fc
    if sp.get("FillFlag") == "Pattern":
        if "HatchBackgroundColor" in sp:
            nc = _atoi(sp["HatchBackgroundColor"]) & 0xFFFFFFFF
            if (nc >> 24) == 0xC3:
                nc &= 0xFFFFFF
                if nc < 256:
                    style += ",bc:#%02x%02x%02x" % tuple(
                        _AC_COLORS[nc * 3:nc * 3 + 3]
                    )
            elif (nc >> 24) == 0xC2:
                style += ",bc:#%06x" % (nc & 0xFFFFFF)
        rot = _atof(sp.get("HatchPatternRotation", "0"))
        pattern = (feat.get("Text") or "").upper()
        if pattern == "ANSI31":
            if abs(rot - -45) < 1e-12 or abs(rot - 315) < 1e-12:
                style += ',id:"ogr-brush-2"'
            elif abs(rot - 45) < 1e-12 or abs(rot - 225) < 1e-12:
                style += ',id:"ogr-brush-3"'
            elif (abs(rot - 90) < 1e-12 or abs(rot - -90) < 1e-12
                  or abs(rot - 270) < 1e-12):
                style += ',id:"ogr-brush-4"'
            elif abs(rot) < 1e-12:
                style += ',id:"ogr-brush-5"'
            else:
                style += ',id:"ogr-brush-5",a:%f' % rot
        elif pattern == "ANSI37":
            if abs(rot - 45) < 1e-12 or abs(rot - 225) < 1e-12:
                style += ',id:"ogr-brush-6"'
            elif abs(rot) < 1e-12:
                style += ',id:"ogr-brush-7"'
            else:
                style += ',id:"ogr-brush-7",a:%f' % rot
        elif pattern == "NULL":
            style += ',id:"ogr-brush-1"'
        if "HatchPatternScale" in sp:
            hscale = _atof(sp["HatchPatternScale"])
            if abs(hscale - 1) > 1e-12:
                style += ",s:%f" % hscale
    elif fc == "#00000000":
        style += ',id:"ogr-brush-1"'
    return style + ")"


def _escape_text(text: str) -> str:
    return text.replace('"', '\\"') if '"' in text else text


def label_style(font: str, bold: bool, italic: bool, text: str,
                anchor: int | None, angle: float, height: float,
                width_pct: float | None, dx: float | None, dy: float | None,
                color: str, anchor_first: bool = True) -> str:
    """Shared LABEL(...) assembly for TEXT/MTEXT/ATTRIB/dimension/leader
    labels; argument order mirrors the reference emitters. When
    anchor_first is False (MTEXT), p: comes after s:/w: like the
    reference's MTEXT emitter."""
    style = 'LABEL(f:"' + font + '"'
    if bold:
        style += ",bo:1"
    if italic:
        style += ",it:1"
    style += ',t:"' + _escape_text(text) + '"'
    if anchor_first and anchor is not None:
        style += ",p:%d" % anchor
    if angle != 0.0:
        style += ",a:" + _g("%.3g", angle)
    if height != 0.0:
        style += ",s:" + _g("%.3g", height) + "g"
    if width_pct is not None and width_pct != 100.0:
        style += ",w:" + _g("%.4g", width_pct)
    if not anchor_first and anchor is not None:
        style += ",p:%d" % anchor
    if dx:
        style += ",dx:" + _g("%.6g", dx) + "g"
    if dy:
        style += ",dy:" + _g("%.6g", dy) + "g"
    return style + ",c:" + color + ")"


def replace_label_color(style: str, color: str) -> str:
    """PrepareFeatureStyle LABEL branch: replace the value of the last
    ,c: entry."""
    i = style.rfind(",c:")
    if i < 0:
        return style
    j = i + 3
    while j < len(style) and style[j] not in ",)":
        j += 1
    return style[:i + 3] + color + style[j:]


def _tokenize_label(style: str):
    """Split LABEL(...) into tokens honouring quoted strings."""
    body = style[6:-1]
    toks = []
    cur = ""
    inq = False
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and inq and i + 1 < len(body):
            cur += body[i:i + 2]
            i += 2
            continue
        if c == '"':
            inq = not inq
        if c == "," and not inq:
            toks.append(cur)
            cur = ""
        else:
            cur += c
        i += 1
    toks.append(cur)
    return toks


def adjust_text(style: str, angle: float, sx: float, sy: float) -> str:
    """ACAdjustText: rotate/scale a LABEL style string during block
    insertion (a: += angle, s: *= sy, w: *= sx/sy, dx/dy rotated)."""
    if not style.startswith("LABEL("):
        return style
    toks = _tokenize_label(style)
    keys = [t.split(":", 1)[0] for t in toks]
    vals = {t.split(":", 1)[0]: t.split(":", 1)[1] for t in toks if ":" in t}

    def setval(key, val):
        if key in vals:
            vals[key] = val
        else:
            keys.append(key)
            vals[key] = val

    if angle != 0.0:
        old = _atof(vals.get("a", "0"))
        setval("a", _g("%.3g", old + angle))
    if sy != 1.0 and "s" in vals:
        old = _atof(vals["s"].rstrip("g"))
        setval("s", _g("%.3g", old * sy) + "g")
    if sx != sy and sy != 0.0:
        oldw = _atof(vals.get("w", "100"))
        setval("w", _g("%.4g", oldw * (sx / sy)))
    if sx != 1.0 or sy != 1.0 or angle != 0.0:
        dx = _atof(vals.get("dx", "0").rstrip("g"))
        dy = _atof(vals.get("dy", "0").rstrip("g"))
        if dx != 0.0 or dy != 0.0:
            import math
            ar = math.radians(angle)
            setval("dx", _g("%.6g",
                            sx * dx * math.cos(ar) + sy * dy * -math.sin(ar))
                   + "g")
            setval("dy", _g("%.6g",
                            sx * dx * math.sin(ar) + sy * dy * math.cos(ar))
                   + "g")
    return "LABEL(" + ",".join(
        k + ":" + vals[k] if k in vals else k for k in keys
    ) + ")"


def replace_label_text(style: str, text: str) -> str:
    """TranslateMLEADER attribute handling: replace the value of the
    t:"..." entry in a LABEL style (honouring escaped quotes)."""
    i = style.find(',t:"')
    if i < 0:
        return style
    j = i + 4
    while j < len(style) and style[j] != '"':
        j += 2 if style[j] == "\\" else 1
    if j >= len(style):
        return style
    return style[:i + 4] + _escape_text(text) + style[j:]
