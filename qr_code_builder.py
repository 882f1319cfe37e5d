"""QR-code PNG builder with a caption (ancillary utility).

Mirrors /root/reference/qr_code_builder.py:4-44. The ``qrcode`` package is
not available in all environments; when missing, a pure-PIL fallback renders
the QR matrix via a minimal embedded encoder being out of scope, we raise a
clear error instead.
"""

from __future__ import annotations


def qr_code_builder(data: str, destination_path: str, title: str | None = None) -> None:
    """Generate a QR code PNG for ``data``; optionally draw ``title`` above it."""
    try:
        import qrcode
    except ImportError as e:
        raise ImportError(
            "qr_code_builder requires the 'qrcode' package (not bundled in this "
            "environment). Install it with: pip install qrcode[pil]"
        ) from e
    from PIL import Image, ImageDraw, ImageFont

    qr = qrcode.QRCode(version=1, box_size=10, border=4)
    qr.add_data(data)
    qr.make(fit=True)
    img = qr.make_image(fill_color="black", back_color="white").convert("RGB")

    if title:
        w, h = img.size
        band = 40
        canvas = Image.new("RGB", (w, h + band), "white")
        canvas.paste(img, (0, band))
        draw = ImageDraw.Draw(canvas)
        try:
            font = ImageFont.truetype("DejaVuSans.ttf", 20)
        except OSError:
            font = ImageFont.load_default()
        tw = draw.textlength(title, font=font)
        draw.text(((w - tw) / 2, band / 4), title, fill="black", font=font)
        img = canvas

    img.save(destination_path)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=" ")
    parser.add_argument("--data", type=str, required=True)
    parser.add_argument("--destination_path", type=str, required=True)
    parser.add_argument("--title", type=str, default=None)
    args = parser.parse_args()
    qr_code_builder(args.data, args.destination_path, args.title)
