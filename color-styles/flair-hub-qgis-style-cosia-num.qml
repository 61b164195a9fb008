<!DOCTYPE qgis PUBLIC 'http://mrcc.com/qgis.dtd' 'SYSTEM'>
<qgis minScale="1e+08" maxScale="0" version="3.28" styleCategories="AllStyleCategories">
  <pipe>
    <rasterrenderer type="paletted" band="1" opacity="1" alphaBand="-1">
      <rasterTransparency/>
      <colorPalette>
          <paletteEntry value="0" color="#db0e9a" label="building" alpha="255"/>
          <paletteEntry value="1" color="#938e7b" label="greenhouse" alpha="255"/>
          <paletteEntry value="2" color="#f80c00" label="swimming_pool" alpha="255"/>
          <paletteEntry value="3" color="#a97101" label="impervious surface" alpha="255"/>
          <paletteEntry value="4" color="#1553ae" label="pervious surface" alpha="255"/>
          <paletteEntry value="5" color="#194a26" label="bare soil" alpha="255"/>
          <paletteEntry value="6" color="#46e483" label="water" alpha="255"/>
          <paletteEntry value="7" color="#f3a60d" label="snow" alpha="255"/>
          <paletteEntry value="8" color="#660082" label="herbaceous vegetation" alpha="255"/>
          <paletteEntry value="9" color="#55ff00" label="agricultural land" alpha="255"/>
          <paletteEntry value="10" color="#fff30d" label="plowed land" alpha="255"/>
          <paletteEntry value="11" color="#e4df7c" label="vineyard" alpha="255"/>
          <paletteEntry value="12" color="#3de6eb" label="deciduous" alpha="255"/>
          <paletteEntry value="13" color="#ffffff" label="coniferous" alpha="255"/>
          <paletteEntry value="14" color="#8ab3a0" label="brushwood" alpha="255"/>
          <paletteEntry value="15" color="#6b714f" label="clear cut" alpha="255"/>
          <paletteEntry value="16" color="#c5dc42" label="ligneous" alpha="255"/>
          <paletteEntry value="17" color="#9999ff" label="mixed" alpha="255"/>
          <paletteEntry value="18" color="#000000" label="undefined" alpha="255"/>
      </colorPalette>
    </rasterrenderer>
    <brightnesscontrast brightness="0" contrast="0"/>
    <huesaturation colorizeOn="0" saturation="0" grayscaleMode="0"/>
    <rasterresampler maxOversampling="2"/>
  </pipe>
  <blendMode>0</blendMode>
</qgis>
