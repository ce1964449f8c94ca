"""Generator/discriminator zoo B (translation lineage), TPU-native.

Re-implements models/translation_network.py of the reference:
- Encoder (:466-483), Decoder (:485-503), upsampling variants (:505-531),
  ResnetBottlenec + replicate-padded ResnetBlock (:533-575)
- dual-branch Generator (img_depth / depth / img_feature_depth inputs,
  :612-662) and the GeneratorI_F / GeneratorF_D split generators (:587-610)
- define_Gen (:577-585), define_D (:666-726) with depth/normal/depth_normal
  input types, basic/n_layers/pixel/Gu architectures and optional spectral norm
- NLayerDiscriminator (:735-776), DepthDiscriminator "Gu" (:779-820)

Parameter keys match the reference torch ``state_dict`` exactly
(``enc_img.model.0.weight`` etc.), preserving the checkpoint contract for
``latest_net_G_A_d.pth`` handoff into stage 3 (README.md:58-66).
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp

from desr_tpu.models.layers import (
    BatchNorm2d,
    Conv2d,
    ConvTranspose2d,
    Ctx,
    Dropout,
    InitCfg,
    Layer,
    LeakyReLU,
    ReLU,
    Sequential,
    SpectralNormConv2d,
    Tanh,
    Upsample,
    get_norm_layer,
)
from desr_tpu.models.networks import Net


class _Wrapped(Layer):
    """A layer published under a named attribute (torch submodule)."""

    def __init__(self, name, layer):
        self.name = name
        self.layer = layer

    def init(self, key, prefix, cfg):
        return self.layer.init(key, f"{prefix}{self.name}.", cfg)

    def apply(self, params, x, prefix, ctx):
        return self.layer.apply(params, x, f"{prefix}{self.name}.", ctx)


class TransposeUp(Layer):
    """upsampling_type='transpose' (translation_network.py:505-510)."""

    def __init__(self, in_ch, out_ch, use_bias):
        self.inner = _Wrapped("transposeconv",
                              ConvTranspose2d(in_ch, out_ch, 4, stride=2, padding=1, bias=use_bias))

    def init(self, key, prefix, cfg):
        return self.inner.init(key, prefix, cfg)

    def apply(self, params, x, prefix, ctx):
        return self.inner.apply(params, x, prefix, ctx)


class UpConv(Layer):
    """upsampling_type='upconv' (:512-520): nearest upsample + replicate conv."""

    def __init__(self, in_ch, out_ch, use_bias):
        self.inner = _Wrapped(
            "resizeconv",
            Sequential([
                Upsample(2, "nearest"),
                Conv2d(in_ch, out_ch, 3, stride=1, padding=1, bias=use_bias,
                       padding_mode="replicate"),
            ]),
        )

    def init(self, key, prefix, cfg):
        return self.inner.init(key, prefix, cfg)

    def apply(self, params, x, prefix, ctx):
        return self.inner.apply(params, x, prefix, ctx)


class UpTranspose(Layer):
    """upsampling_type='uptranspose' (:522-531): bilinear-conv + transpose sum."""

    def __init__(self, in_ch, out_ch, use_bias):
        self.resize = _Wrapped(
            "resizeconv",
            Sequential([
                Upsample(2, "bilinear"),
                Conv2d(in_ch, out_ch, 3, stride=1, padding=1, bias=use_bias,
                       padding_mode="replicate"),
            ]),
        )
        self.transpose = _Wrapped(
            "transposeconv",
            ConvTranspose2d(in_ch, out_ch, 4, stride=2, padding=1, bias=False),
        )

    def init(self, key, prefix, cfg):
        p = self.resize.init(key, prefix, cfg)
        p.update(self.transpose.init(jax.random.fold_in(key, 1), prefix, cfg))
        return p

    def apply(self, params, x, prefix, ctx):
        return self.resize.apply(params, x, prefix, ctx) + self.transpose.apply(
            params, x, prefix, ctx)


def _get_up_layer(upsampling_type):
    return {"transpose": TransposeUp, "upconv": UpConv, "uptranspose": UpTranspose}[
        upsampling_type
    ]


class ResnetBlockT(Layer):
    """Translation ResnetBlock (:554-575): replicate-padded, dilation-aware."""

    def __init__(self, dim, dilation, norm_factory, use_bias, dropout):
        pad = int(dilation * (3 - 1) / 2)
        blocks = [
            Conv2d(dim, dim, 3, stride=1, padding=pad, dilation=dilation,
                   padding_mode="replicate", bias=use_bias),
            norm_factory(dim),
            ReLU(),
        ]
        if dropout:
            blocks.append(Dropout(0.5))
        blocks += [
            Conv2d(dim, dim, 3, padding=pad, dilation=dilation,
                   padding_mode="replicate", bias=use_bias),
            norm_factory(dim),
        ]
        self.conv_block = Sequential(blocks)

    def init(self, key, prefix, cfg):
        return self.conv_block.init(key, prefix + "conv_block.", cfg)

    def apply(self, params, x, prefix, ctx):
        return x + self.conv_block.apply(params, x, prefix + "conv_block.", ctx)


def _encoder(input_nc, base_nc, norm_factory, use_bias, n_downsampling):
    model = [
        Conv2d(input_nc, base_nc, 7, stride=1, padding=3, padding_mode="replicate",
               bias=use_bias),
        norm_factory(base_nc),
        ReLU(),
    ]
    for i in range(n_downsampling):
        mult = 2 ** i
        model += [
            Conv2d(base_nc * mult, base_nc * mult * 2, 4, stride=2, padding=1,
                   padding_mode="replicate", bias=use_bias),
            norm_factory(base_nc * mult * 2),
            ReLU(),
        ]
    return _Wrapped("model", Sequential(model))


def _decoder(base_nc, output_nc, norm_factory, use_bias, up_layer, n_downsampling,
             output="depth"):
    model = []
    for i in range(n_downsampling):
        mult = 2 ** (n_downsampling - i)
        model += [
            up_layer(mult * base_nc, base_nc * mult // 2, use_bias),
            norm_factory(base_nc * mult // 2),
            ReLU(),
        ]
    model.append(Conv2d(base_nc, output_nc, 7, stride=1, padding=3,
                        padding_mode="replicate", bias=True))
    if output == "depth":
        assert output_nc == 1, "only 1 channel for depth"
        model.append(Tanh())
    return _Wrapped("model", Sequential(model))


def _bottleneck(base_nc, n_blocks, norm_factory, use_bias, n_downsampling,
                dropout=False, use_dilation=False):
    mult = 2 ** n_downsampling
    blocks = []
    for i in range(n_blocks):
        dilation = min(2 ** i, 8) if use_dilation else 1
        blocks.append(ResnetBlockT(base_nc * mult, dilation, norm_factory, use_bias, dropout))
    return _Wrapped("model", Sequential(blocks))


class TranslationGenerator:
    """Dual-branch translator (translation_network.py:612-662).

    input_type='img_depth': separate depth + image encoders, channel-concat
    into a 9-block bottleneck, depth decoder with Tanh. apply(params, depth,
    img) with NHWC tensors.
    """

    def __init__(self, opt, input_type, use_bias):
        self.input_type = input_type
        self.opt = opt
        norm_factory, _ = get_norm_layer(opt.norm, lineage="translation")
        up_layer = _get_up_layer(opt.upsampling_type)
        nd = opt.n_downsampling
        dropout = opt.dropout
        if input_type == "img_depth":
            base_nc = opt.ngf_img + opt.ngf_depth
            self.enc_img = _encoder(opt.input_nc_img, opt.ngf_img, norm_factory, use_bias, nd)
            self.enc_depth = _encoder(opt.input_nc_depth, opt.ngf_depth, norm_factory, use_bias, nd)
            self.bottlenec = _bottleneck(base_nc, opt.n_blocks, norm_factory, use_bias, nd, dropout)
            self.dec_depth = _decoder(base_nc, opt.output_nc_depth, norm_factory, use_bias,
                                      up_layer, nd, "depth")
        elif input_type == "depth":
            base_nc = opt.ngf_depth * 2
            self.enc_depth = _encoder(opt.input_nc_depth, base_nc, norm_factory, use_bias, nd)
            self.bottlenec = _bottleneck(base_nc, opt.n_blocks, norm_factory, use_bias, nd, dropout)
            self.dec_depth = _decoder(base_nc, opt.output_nc_depth, norm_factory, use_bias,
                                      up_layer, nd, "depth")
        else:
            raise NotImplementedError(f"input type {input_type}")
        self.init_cfg = InitCfg(init_type=opt.init_type, gain_from_nonlinearity=True,
                                nonlinearity="relu")

    def init(self, key):
        parts = ["enc_depth", "bottlenec", "dec_depth"]
        if self.input_type == "img_depth":
            parts = ["enc_img"] + parts
        params = {}
        for i, name in enumerate(parts):
            params.update(getattr(self, name).init(jax.random.fold_in(key, i), f"{name}.", self.init_cfg))
        return params

    def apply(self, params, depth, img=None, ctx: Ctx = Ctx()):
        if self.input_type == "img_depth":
            fi = self.enc_img.apply(params, img, "enc_img.", ctx)
            fd = self.enc_depth.apply(params, depth, "enc_depth.", ctx)
            x = jnp.concatenate([fd, fi], axis=-1)
            x = self.bottlenec.apply(params, x, "bottlenec.", ctx)
            return self.dec_depth.apply(params, x, "dec_depth.", ctx)
        fd = self.enc_depth.apply(params, depth, "enc_depth.", ctx)
        x = self.bottlenec.apply(params, fd, "bottlenec.", ctx)
        return self.dec_depth.apply(params, x, "dec_depth.", ctx)

    def param_count(self, params):
        return sum(int(v.size) for v in params.values())


def default_translator_opt(**overrides):
    """The hardcoded translator config of models/translation_model.py:86-90 /
    models/main_model.py:147-148."""
    opt = SimpleNamespace(
        ngf_img=32, ngf_depth=32, ngf=64, norm="group", dropout=False,
        init_type="normal", input_nc_img=3, n_downsampling=2, use_semantic=False,
        n_blocks=9, upsampling_type="transpose", output_nc_depth=1, input_nc_depth=1,
    )
    for k, v in overrides.items():
        setattr(opt, k, v)
    return opt


class GeneratorI_F:
    """image -> feature split generator (translation_network.py:587-597;
    unused in shipped configs, kept for API surface parity)."""

    def __init__(self, opt, use_bias):
        norm_factory, _ = get_norm_layer(opt.norm, lineage="translation")
        base_nc = opt.ngf_img_feature
        nd = opt.n_downsampling
        self.enc = _encoder(opt.input_nc_img, base_nc, norm_factory, use_bias, nd)
        self.bottlenec = _bottleneck(base_nc, 6, norm_factory, use_bias, nd,
                                     opt.dropout, use_dilation=True)
        self.init_cfg = InitCfg(init_type=opt.init_type, gain_from_nonlinearity=True,
                                nonlinearity="relu")

    def init(self, key):
        p = self.enc.init(jax.random.fold_in(key, 0), "enc.", self.init_cfg)
        p.update(self.bottlenec.init(jax.random.fold_in(key, 1), "bottlenec.", self.init_cfg))
        return p

    def apply(self, params, x, ctx: Ctx = Ctx()):
        x = self.enc.apply(params, x, "enc.", ctx)
        return self.bottlenec.apply(params, x, "bottlenec.", ctx)


class GeneratorF_D:
    """feature -> depth split generator (translation_network.py:599-610)."""

    def __init__(self, opt, use_bias):
        norm_factory, _ = get_norm_layer(opt.norm, lineage="translation")
        up_layer = _get_up_layer(opt.upsampling_type)
        base_nc = opt.ngf_img_feature
        nd = opt.n_downsampling
        self.bottlenec = _bottleneck(base_nc, 9, norm_factory, use_bias, nd, opt.dropout)
        self.dec = _decoder(base_nc, opt.output_nc_depth, norm_factory, use_bias,
                            up_layer, nd, "depth")
        self.init_cfg = InitCfg(init_type=opt.init_type, gain_from_nonlinearity=True,
                                nonlinearity="relu")

    def init(self, key):
        p = self.bottlenec.init(jax.random.fold_in(key, 0), "bottlenec.", self.init_cfg)
        p.update(self.dec.init(jax.random.fold_in(key, 1), "dec.", self.init_cfg))
        return p

    def apply(self, params, x, ctx: Ctx = Ctx()):
        x = self.bottlenec.apply(params, x, "bottlenec.", ctx)
        return self.dec.apply(params, x, "dec.", ctx)


def define_Gen(opt, input_type, out_type="depth"):
    """Mirror of translation_network.py:577-585."""
    use_bias = opt.norm == "instance"
    if input_type == "img" and out_type == "feature":
        return GeneratorI_F(opt, use_bias)
    if input_type == "feature" and out_type == "depth":
        return GeneratorF_D(opt, use_bias)
    return TranslationGenerator(opt, input_type, use_bias)


def _nlayer_discriminator_b(input_nc, ndf, n_layers, norm_factory, use_bias, conv_cls):
    seq = [conv_cls(input_nc, ndf, 4, stride=2, padding=1, bias=True), LeakyReLU(0.2)]
    nf_mult = 1
    for n in range(1, n_layers):
        nf_mult_prev, nf_mult = nf_mult, min(2 ** n, 8)
        seq += [
            conv_cls(ndf * nf_mult_prev, ndf * nf_mult, 4, stride=2, padding=1, bias=use_bias),
            norm_factory(ndf * nf_mult),
            LeakyReLU(0.2),
        ]
    nf_mult_prev, nf_mult = nf_mult, min(2 ** n_layers, 8)
    seq += [
        conv_cls(ndf * nf_mult_prev, ndf * nf_mult, 4, stride=1, padding=1, bias=use_bias),
        norm_factory(ndf * nf_mult),
        LeakyReLU(0.2),
        conv_cls(ndf * nf_mult, 1, 4, stride=1, padding=1, bias=True),
    ]
    return Sequential(seq)


def _gu_discriminator(input_nc, ndf, conv_cls):
    """DepthDiscriminator "Gu" (:779-820); default norm is BatchNorm2d."""
    mults = [1, 1, 1, 2, 1, 2, 1, 1]
    strides = [1, 2, 1, 2, 1, 2, 1, 2]
    seq = []
    prev, cur = input_nc, ndf
    for m, s in zip(mults, strides):
        seq += [conv_cls(prev, cur, 3, stride=s, padding=1, bias=False),
                BatchNorm2d(cur), LeakyReLU(0.2)]
        prev = cur
        cur = cur * m
    seq.append(conv_cls(prev, 1, 3, stride=1, padding=1, bias=True))
    return Sequential(seq)


def define_D(opt, input_type="depth"):
    """Mirror of translation_network.py:666-726."""
    input_nc = {"depth": 1, "normal": 3, "depth_normal": 4}[input_type]
    norm_factory, _ = get_norm_layer(opt.norm_d, lineage="translation")
    use_bias = opt.norm_d == "instance"
    conv_cls = SpectralNormConv2d if getattr(opt, "use_spnorm", False) else Conv2d
    cfg = InitCfg(init_type=opt.init_type, gain_from_nonlinearity=True,
                  nonlinearity="leaky_relu", neg_slope=0.2)
    if opt.netD == "basic":
        root = _nlayer_discriminator_b(input_nc, opt.ndf, 3, norm_factory, use_bias, conv_cls)
        return Net(root, cfg, "model.")
    if opt.netD == "n_layers":
        root = _nlayer_discriminator_b(input_nc, opt.ndf, opt.n_layers_D, norm_factory,
                                       use_bias, conv_cls)
        return Net(root, cfg, "model.")
    if opt.netD == "Gu":
        # the reference passes only input_nc: ndf stays at its default 64
        # (translation_network.py:716, :782)
        root = _gu_discriminator(input_nc, 64, conv_cls)
        return Net(root, cfg, "model.")
    if opt.netD == "pixel":
        from desr_tpu.models.networks import _pixel_discriminator

        root = _pixel_discriminator(input_nc, opt.ndf, norm_factory, use_bias)
        return Net(root, cfg, "net.")
    raise NotImplementedError(f"Discriminator model name [{opt.netD}] is not recognized")
