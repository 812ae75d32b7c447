"""Independent PyTorch oracle implementations for numerical-parity tests.

These are small torch modules implementing the publicly documented SAM
ViTDet-encoder math (patch embed, windowed attention with decomposed relative
position bias, neck) and the reference's TopoNet/decoder compositions built
from NATIVE torch modules (nn.TransformerEncoder, nn.ConvTranspose2d), used
only as golden oracles to validate the flax implementations and the
checkpoint converter. Test-only code; not part of the framework.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn


# ---------------- SAM ViTDet encoder oracle ----------------


def get_rel_pos(q_size, k_size, rel_pos):
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos_resized = F.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=max_rel_dist,
            mode="linear",
        )
        rel_pos_resized = rel_pos_resized.reshape(-1, max_rel_dist).permute(1, 0)
    else:
        rel_pos_resized = rel_pos
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative_coords = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos_resized[relative_coords.long()]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = get_rel_pos(q_h, k_h, rel_pos_h)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w)
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = (
        attn.view(B, q_h, q_w, k_h, k_w)
        + rel_h[:, :, :, :, None]
        + rel_w[:, :, :, None, :]
    ).view(B, q_h * q_w, k_h * k_w)
    return attn


def window_partition(x, window_size):
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h > 0 or pad_w > 0:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.view(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    windows = (
        x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, window_size, window_size, C)
    )
    return windows, (Hp, Wp)


def window_unpartition(windows, window_size, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.view(
        B, Hp // window_size, Wp // window_size, window_size, window_size, -1
    )
    x = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, Hp, Wp, -1)
    if Hp > H or Wp > W:
        x = x[:, :H, :W, :].contiguous()
    return x


class OracleAttention(nn.Module):
    def __init__(self, dim, num_heads, input_size, use_rel_pos=True):
        super().__init__()
        self.num_heads = num_heads
        head_dim = dim // num_heads
        self.scale = head_dim**-0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.use_rel_pos = use_rel_pos
        if use_rel_pos:
            self.rel_pos_h = nn.Parameter(torch.zeros(2 * input_size[0] - 1, head_dim))
            self.rel_pos_w = nn.Parameter(torch.zeros(2 * input_size[1] - 1, head_dim))
        self.input_size = input_size

    def forward(self, x):
        B, H, W, _ = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B, H * W, 3, self.num_heads, -1)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv.reshape(3, B * self.num_heads, H * W, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        if self.use_rel_pos:
            attn = add_decomposed_rel_pos(
                attn, q, self.rel_pos_h, self.rel_pos_w, (H, W), (H, W)
            )
        attn = attn.softmax(dim=-1)
        x = (
            (attn @ v)
            .view(B, self.num_heads, H, W, -1)
            .permute(0, 2, 3, 1, 4)
            .reshape(B, H, W, -1)
        )
        return self.proj(x)


class OracleMLP(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.lin1 = nn.Linear(dim, hidden)
        self.lin2 = nn.Linear(hidden, dim)
        self.act = nn.GELU()

    def forward(self, x):
        return self.lin2(self.act(self.lin1(x)))


class OracleBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, window_size, input_size):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        attn_size = (
            (window_size, window_size) if window_size > 0 else input_size
        )
        self.attn = OracleAttention(dim, num_heads, attn_size)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = OracleMLP(dim, int(dim * mlp_ratio))
        self.window_size = window_size

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        x = self.attn(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class OracleLayerNorm2d(nn.Module):
    def __init__(self, num_channels, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(num_channels))
        self.bias = nn.Parameter(torch.zeros(num_channels))
        self.eps = eps

    def forward(self, x):  # NCHW
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class OraclePatchEmbed(nn.Module):
    def __init__(self, patch_size, in_chans, embed_dim):
        super().__init__()
        self.proj = nn.Conv2d(
            in_chans, embed_dim, kernel_size=patch_size, stride=patch_size
        )

    def forward(self, x):  # NCHW -> NHWC
        return self.proj(x).permute(0, 2, 3, 1)


class OracleImageEncoderViT(nn.Module):
    def __init__(
        self,
        img_size=96,
        patch_size=16,
        embed_dim=64,
        depth=3,
        num_heads=2,
        mlp_ratio=4.0,
        out_chans=32,
        window_size=4,
        global_attn_indexes=(1,),
    ):
        super().__init__()
        self.img_size = img_size
        grid = img_size // patch_size
        self.patch_embed = OraclePatchEmbed(patch_size, 3, embed_dim)
        self.pos_embed = nn.Parameter(torch.zeros(1, grid, grid, embed_dim))
        self.blocks = nn.ModuleList(
            [
                OracleBlock(
                    embed_dim,
                    num_heads,
                    mlp_ratio,
                    0 if i in global_attn_indexes else window_size,
                    (grid, grid),
                )
                for i in range(depth)
            ]
        )
        self.neck = nn.Sequential(
            nn.Conv2d(embed_dim, out_chans, 1, bias=False),
            OracleLayerNorm2d(out_chans),
            nn.Conv2d(out_chans, out_chans, 3, padding=1, bias=False),
            OracleLayerNorm2d(out_chans),
        )

    def forward(self, x):  # NCHW in
        x = self.patch_embed(x)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.neck(x.permute(0, 3, 1, 2))  # NCHW out


# ---------------- TopoNet oracle (native torch modules) ----------------


class OracleTopoNet(nn.Module):
    def __init__(self, feature_dim, version="normal"):
        super().__init__()
        self.version = version
        self.hidden_dim = 128
        self.feature_proj = nn.Linear(feature_dim, self.hidden_dim)
        self.pair_proj = nn.Linear(2 * self.hidden_dim + 2, self.hidden_dim)
        layer = nn.TransformerEncoderLayer(
            d_model=self.hidden_dim,
            nhead=4,
            dim_feedforward=self.hidden_dim,
            dropout=0.1,
            activation="relu",
            batch_first=True,
        )
        if version != "no_transformer":
            self.transformer_encoder = nn.TransformerEncoder(
                layer, num_layers=3, enable_nested_tensor=False
            )
        self.output_proj = nn.Linear(self.hidden_dim, 1)

    def forward(self, points, point_features, pairs, pairs_valid):
        point_features = F.relu(self.feature_proj(point_features))
        batch_size, n_samples, n_pairs, _ = pairs.shape
        pairs = pairs.view(batch_size, -1, 2)
        batch_indices = (
            torch.arange(batch_size).view(-1, 1).expand(-1, n_samples * n_pairs)
        )
        src_features = point_features[batch_indices, pairs[:, :, 0]]
        tgt_features = point_features[batch_indices, pairs[:, :, 1]]
        src_points = points[batch_indices, pairs[:, :, 0]]
        tgt_points = points[batch_indices, pairs[:, :, 1]]
        offset = tgt_points - src_points
        if self.version == "no_offset":
            pair_features = torch.concat(
                [src_features, tgt_features, torch.zeros_like(offset)], dim=2
            )
        else:
            pair_features = torch.concat([src_features, tgt_features, offset], dim=2)
        pair_features = F.relu(self.pair_proj(pair_features))
        pair_features = pair_features.view(batch_size * n_samples, n_pairs, -1)
        pairs_valid = pairs_valid.view(batch_size * n_samples, n_pairs)
        all_invalid = torch.eq(torch.sum(pairs_valid, dim=-1), 0).unsqueeze(-1)
        pairs_valid = torch.logical_or(pairs_valid, all_invalid)
        padding_mask = ~pairs_valid
        if self.version != "no_transformer":
            pair_features = self.transformer_encoder(
                pair_features, src_key_padding_mask=padding_mask
            )
        _, n_pairs, _ = pair_features.shape
        pair_features = pair_features.view(batch_size, n_samples, n_pairs, -1)
        logits = self.output_proj(pair_features)
        return logits, torch.sigmoid(logits)


# ---------------- Naive map decoder oracle ----------------


def make_oracle_map_decoder(in_dim=32):
    return nn.Sequential(
        nn.ConvTranspose2d(in_dim, 128, kernel_size=2, stride=2),
        OracleLayerNorm2d(128),
        nn.GELU(),
        nn.ConvTranspose2d(128, 64, kernel_size=2, stride=2),
        nn.GELU(),
        nn.ConvTranspose2d(64, 32, kernel_size=2, stride=2),
        nn.GELU(),
        nn.ConvTranspose2d(32, 2, kernel_size=2, stride=2),
    )


# ---------------- SAM mask-decoder oracle (null-prompt path) ----------------


class OracleSamAttention(nn.Module):
    def __init__(self, embedding_dim, num_heads, downsample_rate=1):
        super().__init__()
        self.embedding_dim = embedding_dim
        self.internal_dim = embedding_dim // downsample_rate
        self.num_heads = num_heads
        self.q_proj = nn.Linear(embedding_dim, self.internal_dim)
        self.k_proj = nn.Linear(embedding_dim, self.internal_dim)
        self.v_proj = nn.Linear(embedding_dim, self.internal_dim)
        self.out_proj = nn.Linear(self.internal_dim, embedding_dim)

    def _heads(self, x):
        b, n, c = x.shape
        x = x.reshape(b, n, self.num_heads, c // self.num_heads)
        return x.transpose(1, 2)

    def forward(self, q, k, v):
        q = self._heads(self.q_proj(q))
        k = self._heads(self.k_proj(k))
        v = self._heads(self.v_proj(v))
        c_per_head = q.shape[-1]
        attn = q @ k.permute(0, 1, 3, 2) / math.sqrt(c_per_head)
        attn = torch.softmax(attn, dim=-1)
        out = attn @ v
        b, nh, n, ch = out.shape
        out = out.transpose(1, 2).reshape(b, n, nh * ch)
        return self.out_proj(out)


class OracleSamMLPBlock(nn.Module):
    def __init__(self, embedding_dim, mlp_dim):
        super().__init__()
        self.lin1 = nn.Linear(embedding_dim, mlp_dim)
        self.lin2 = nn.Linear(mlp_dim, embedding_dim)

    def forward(self, x):
        return self.lin2(torch.relu(self.lin1(x)))


class OracleTwoWayAttentionBlock(nn.Module):
    def __init__(self, embedding_dim, num_heads, mlp_dim, skip_first_layer_pe):
        super().__init__()
        self.self_attn = OracleSamAttention(embedding_dim, num_heads)
        self.norm1 = nn.LayerNorm(embedding_dim)
        self.cross_attn_token_to_image = OracleSamAttention(
            embedding_dim, num_heads, downsample_rate=2
        )
        self.norm2 = nn.LayerNorm(embedding_dim)
        self.mlp = OracleSamMLPBlock(embedding_dim, mlp_dim)
        self.norm3 = nn.LayerNorm(embedding_dim)
        self.norm4 = nn.LayerNorm(embedding_dim)
        self.cross_attn_image_to_token = OracleSamAttention(
            embedding_dim, num_heads, downsample_rate=2
        )
        self.skip_first_layer_pe = skip_first_layer_pe

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self.cross_attn_token_to_image(q, k, keys)
        queries = self.norm2(queries)
        queries = queries + self.mlp(queries)
        queries = self.norm3(queries)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + self.cross_attn_image_to_token(k, q, queries)
        keys = self.norm4(keys)
        return queries, keys


class OracleTwoWayTransformer(nn.Module):
    def __init__(self, depth=2, embedding_dim=256, num_heads=8, mlp_dim=2048):
        super().__init__()
        self.layers = nn.ModuleList(
            [
                OracleTwoWayAttentionBlock(
                    embedding_dim, num_heads, mlp_dim, skip_first_layer_pe=(i == 0)
                )
                for i in range(depth)
            ]
        )
        self.final_attn_token_to_image = OracleSamAttention(
            embedding_dim, num_heads, downsample_rate=2
        )
        self.norm_final_attn = nn.LayerNorm(embedding_dim)

    def forward(self, image_embedding, image_pe, point_embedding):
        b, c, h, w = image_embedding.shape
        image_embedding = image_embedding.flatten(2).permute(0, 2, 1)
        image_pe = image_pe.flatten(2).permute(0, 2, 1)
        queries = point_embedding
        keys = image_embedding
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, image_pe)
        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        queries = self.norm_final_attn(queries)
        return queries, keys


class OracleSamMLP(nn.Module):
    def __init__(self, input_dim, hidden_dim, output_dim, num_layers):
        super().__init__()
        h = [hidden_dim] * (num_layers - 1)
        self.layers = nn.ModuleList(
            nn.Linear(n, k) for n, k in zip([input_dim] + h, h + [output_dim])
        )

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = torch.relu(layer(x)) if i < len(self.layers) - 1 else layer(x)
        return x


class OracleSamDecoderHead(nn.Module):
    """Null-prompt PromptEncoder + MaskDecoder, multimask path, with torch
    state-dict keys matching the SAM checkpoints."""

    def __init__(self, image_size, embed_dim=256, num_multimask_outputs=2):
        super().__init__()
        self.image_size = image_size
        self.num_mask_tokens = num_multimask_outputs + 1
        # prompt encoder pieces
        self.pe_gaussian = nn.Parameter(torch.randn(2, embed_dim // 2))
        self.no_mask_embed = nn.Embedding(1, embed_dim)
        # mask decoder
        self.iou_token = nn.Embedding(1, embed_dim)
        self.mask_tokens = nn.Embedding(self.num_mask_tokens, embed_dim)
        self.transformer = OracleTwoWayTransformer()
        self.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(embed_dim, embed_dim // 4, 2, 2),
            OracleLayerNorm2d(embed_dim // 4),
            nn.GELU(),
            nn.ConvTranspose2d(embed_dim // 4, embed_dim // 8, 2, 2),
            nn.GELU(),
        )
        self.output_hypernetworks_mlps = nn.ModuleList(
            [
                OracleSamMLP(embed_dim, embed_dim, embed_dim // 8, 3)
                for _ in range(self.num_mask_tokens)
            ]
        )
        self.iou_prediction_head = OracleSamMLP(embed_dim, 256, self.num_mask_tokens, 3)

    def dense_pe(self, h, w):
        ys = (torch.arange(h, dtype=torch.float32) + 0.5) / h
        xs = (torch.arange(w, dtype=torch.float32) + 0.5) / w
        grid = torch.stack(torch.meshgrid(ys, xs, indexing="ij"), dim=-1)
        coords = 2 * grid - 1
        proj = coords @ self.pe_gaussian * (2 * math.pi)
        pe = torch.cat([torch.sin(proj), torch.cos(proj)], dim=-1)
        return pe.permute(2, 0, 1).unsqueeze(0)  # (1, C, h, w)

    def forward(self, image_embeddings):  # NCHW
        b, c, h, w = image_embeddings.shape
        dense = self.no_mask_embed.weight.reshape(1, -1, 1, 1)
        src = image_embeddings + dense
        pos_src = self.dense_pe(h, w).expand(b, -1, -1, -1)
        output_tokens = torch.cat(
            [self.iou_token.weight, self.mask_tokens.weight], dim=0
        )
        tokens = output_tokens.unsqueeze(0).expand(b, -1, -1)
        hs, keys = self.transformer(src, pos_src, tokens)
        mask_tokens_out = hs[:, 1 : 1 + self.num_mask_tokens, :]
        upscaled = self.output_upscaling(
            keys.transpose(1, 2).reshape(b, c, h, w)
        )
        hyper_in = torch.stack(
            [
                self.output_hypernetworks_mlps[i](mask_tokens_out[:, i, :])
                for i in range(self.num_mask_tokens)
            ],
            dim=1,
        )
        bb, cc, hh, ww = upscaled.shape
        masks = (hyper_in @ upscaled.reshape(bb, cc, hh * ww)).reshape(
            bb, -1, hh, ww
        )
        masks = masks[:, 1:, :, :]
        masks = F.interpolate(
            masks, (self.image_size, self.image_size), mode="bilinear",
            align_corners=False,
        )
        return masks

    def sam_state_dict(self):
        """Rename params to the SAM checkpoint layout."""
        sd = {}
        for k, v in self.state_dict().items():
            if k == "pe_gaussian":
                sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = v
            elif k == "no_mask_embed.weight":
                sd["prompt_encoder.no_mask_embed.weight"] = v
            else:
                sd["mask_decoder." + k] = v
        return sd
